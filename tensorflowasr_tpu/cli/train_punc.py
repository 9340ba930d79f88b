"""Punctuation-model training CLI — parity with the reference
train_punc.py (BERT distillation optional via precomputed features;
orbax checkpoints under running_config.outdir)."""

from __future__ import annotations

import logging
import sys


from tensorflowasr_tpu.cli.common import (
    build_punc_model,
    config_parser,
    load_config,
)

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    parser = config_parser(__doc__)
    parser.add_argument("--bert_feature_dir", default=None,
                        help="dir of precomputed teacher features (.npy)")
    args = parser.parse_args(argv)
    config = load_config(args)

    from tensorflowasr_tpu.train.punc_trainer import (
        make_punc_eval_step,
        make_punc_train_step,
    )

    from tensorflowasr_tpu.train.base import GenericTrainer

    _, dl, model, state = build_punc_model(config)
    dl.bert_feature_dir = args.bert_feature_dir

    rc = config.section("running_config")
    trainer = GenericTrainer(
        state, make_punc_train_step(model, donate=False),
        make_punc_eval_step(model), outdir=rc["outdir"] or "./punc-logs",
        running_config=rc)
    if rc["outdir"] and trainer.restore():
        logger.info("resumed from step %d", int(trainer.state.step))

    def train_iter():
        while True:
            yield dl.generate(True)
            dl.save_state()     # resumable offset snapshot per batch

    trainer.fit(train_iter(), eval_iter=dl.generator(train=False),
                total_steps=args.total_steps)
    trainer.save()
    return 0


if __name__ == "__main__":
    sys.exit(main())
