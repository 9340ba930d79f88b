"""VAD training CLI — parity with the reference train_vad.py."""

from __future__ import annotations

import logging
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.cli.common import config_parser, load_config

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    args = config_parser(__doc__).parse_args(argv)
    config = load_config(args)

    from tensorflowasr_tpu.data.vad_dataloader import VADDataLoader
    from tensorflowasr_tpu.models.vad import OfflineVAD, OnlineVAD
    from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer
    from tensorflowasr_tpu.train.vad_trainer import (
        make_vad_eval_step,
        make_vad_train_step,
        streaming_reshape,
    )

    sc = config["speech_config"] or {}
    mc = config["model_config"] or {}
    rc = config["running_config"] or {}
    dl = VADDataLoader(config)
    cls = OnlineVAD if (mc["name"] or "CNN_Online_VAD") == "CNN_Online_VAD" \
        else OfflineVAD
    model = cls(dmodel=mc["dmodel"] or 32,
                frame_input=sc["frame_input"] or 80)

    batch = dl.generate(train=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch["x"]))
    state = ASRTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(config["optimizer_config"]))
    train_step = make_vad_train_step(model)
    eval_step = make_vad_eval_step(model)

    streaming = bool(sc["streaming"])
    min_frames = int(sc["streaming_min_frame"] or 8)
    rng = np.random.default_rng(0)
    log_interval = rc["log_interval_steps"] or 100
    for step in range(1, args.total_steps + 1):
        b = dl.generate(train=True)
        if streaming:
            b = streaming_reshape(b, min_frames, rng)
        state, metrics = train_step(
            state, {k: jnp.asarray(v) for k, v in b.items()})
        if step % log_interval == 0:
            em = eval_step(state, {k: jnp.asarray(v) for k, v in
                                   dl.generate(train=False).items()})
            logger.info("step %d train %s eval %s", step,
                        {k: round(float(v), 4) for k, v in metrics.items()},
                        {k: round(float(v), 4) for k, v in em.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
