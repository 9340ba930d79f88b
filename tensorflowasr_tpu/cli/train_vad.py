"""VAD training CLI — parity with the reference train_vad.py (orbax
checkpoints saved under running_config.outdir)."""

from __future__ import annotations

import logging
import os
import sys

import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.cli.common import (
    build_vad_model,
    config_parser,
    load_config,
)

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    args = config_parser(__doc__).parse_args(argv)
    config = load_config(args)

    from tensorflowasr_tpu.data.vad_dataloader import VADDataLoader
    from tensorflowasr_tpu.train.vad_trainer import (
        make_vad_eval_step,
        make_vad_train_step,
        streaming_reshape,
    )

    sc = config.section("speech_config")
    rc = config.section("running_config")
    dl = VADDataLoader(config)
    model, state = build_vad_model(config)
    train_step = make_vad_train_step(model, donate=False)
    eval_step = make_vad_eval_step(model)

    ckpt_mgr = None
    if rc["outdir"]:
        from tensorflowasr_tpu.train.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(os.path.join(rc["outdir"],
                                                  "checkpoints"))
        restored = ckpt_mgr.restore_latest(state)
        if restored is not None:
            state = restored
            logger.info("resumed from step %d", int(state.step))

    streaming = bool(sc["streaming"])
    min_frames = int(sc["streaming_min_frame"] or 8)
    rng = np.random.default_rng(0)
    log_interval = rc["log_interval_steps"] or 100
    save_interval = rc["save_interval_steps"] or 500
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
        if ckpt_mgr is not None and step % save_interval == 0:
            ckpt_mgr.save(int(state.step), state)
    if ckpt_mgr is not None:
        ckpt_mgr.save(int(state.step), state)
    return 0


if __name__ == "__main__":
    sys.exit(main())
