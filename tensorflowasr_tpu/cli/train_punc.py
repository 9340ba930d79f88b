"""Punctuation-model training CLI — parity with the reference
train_punc.py (BERT distillation optional via precomputed features;
orbax checkpoints under running_config.outdir)."""

from __future__ import annotations

import logging
import os
import sys

import jax
import jax.numpy as jnp

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

    _, dl, model, state = build_punc_model(config)
    dl.bert_feature_dir = args.bert_feature_dir
    train_step = make_punc_train_step(model, donate=False)
    eval_step = make_punc_eval_step(model)

    rc = config.section("running_config")
    ckpt_mgr = None
    if rc["outdir"]:
        from tensorflowasr_tpu.train.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(os.path.join(rc["outdir"],
                                                  "checkpoints"))
        restored = ckpt_mgr.restore_latest(state)
        if restored is not None:
            state = restored
            logger.info("resumed from step %d", int(state.step))

    log_interval = rc["log_interval_steps"] or 100
    save_interval = rc["save_interval_steps"] or 500
    key = jax.random.PRNGKey(0)
    for step in range(1, args.total_steps + 1):
        b = {k: jnp.asarray(v) for k, v in dl.generate(True).items()}
        state, metrics = train_step(state, b, key)
        if step % log_interval == 0:
            dl.save_state()
            eb = {k: jnp.asarray(v) for k, v in dl.generate(False).items()}
            em = eval_step(state, eb)
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
