"""VAD training CLI — parity with the reference train_vad.py (orbax
checkpoints saved under running_config.outdir)."""

from __future__ import annotations

import logging
import sys

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

    from tensorflowasr_tpu.train.base import GenericTrainer

    sc = config.section("speech_config")
    rc = config.section("running_config")
    dl = VADDataLoader(config)
    model, state = build_vad_model(config)
    trainer = GenericTrainer(
        state, make_vad_train_step(model, donate=False,
                                   global_batch=int(rc["batch_size"]
                                                    or 8)),
        make_vad_eval_step(model), outdir=rc["outdir"] or "./vad-logs",
        running_config=rc)
    if rc["outdir"] and trainer.restore():
        logger.info("resumed from step %d", int(trainer.state.step))

    streaming = bool(sc["streaming"])
    min_frames = int(sc["streaming_min_frame"] or 8)
    rng = np.random.default_rng(0)

    def train_iter():
        while True:
            b = dl.generate(train=True)
            if streaming:
                b = streaming_reshape(b, min_frames, rng)
            yield b

    trainer.fit(train_iter(), eval_iter=dl.generator(train=False),
                total_steps=args.total_steps)
    trainer.save()
    return 0


if __name__ == "__main__":
    sys.exit(main())
