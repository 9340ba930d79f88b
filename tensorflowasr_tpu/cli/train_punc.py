"""Punctuation-model training CLI — parity with the reference
train_punc.py (BERT distillation optional via precomputed features)."""

from __future__ import annotations

import logging
import sys

import jax
import jax.numpy as jnp

from tensorflowasr_tpu.cli.common import config_parser, load_config

logger = logging.getLogger(__name__)


def main(argv=None) -> int:
    parser = config_parser(__doc__)
    parser.add_argument("--bert_feature_dir", default=None,
                        help="dir of precomputed teacher features (.npy)")
    args = parser.parse_args(argv)
    config = load_config(args)

    from tensorflowasr_tpu.data.punc_dataloader import PuncDataLoader
    from tensorflowasr_tpu.models.punc import PuncConfig, PuncTransformer
    from tensorflowasr_tpu.train.punc_trainer import (
        make_punc_eval_step,
        make_punc_train_step,
    )
    from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer
    from tensorflowasr_tpu.utils.text import TextFeaturizer

    char_f = TextFeaturizer(dict((config["punc_vocab"] or {}).items()))
    bd_vocab_path = (config["punc_biaodian"] or {})["vocabulary"]
    punc_tokens = []
    if bd_vocab_path:
        bd_f = TextFeaturizer({"vocabulary": bd_vocab_path,
                               "blank_at_zero": True})
        punc_tokens = [t for t in bd_f.vocab_array
                       if t not in ("<S>", "</S>")]
    dl = PuncDataLoader(config, char_f, punc_tokens,
                        bert_feature_dir=args.bert_feature_dir)

    model = PuncTransformer(PuncConfig.from_user_config(config),
                            char_f.num_classes, dl.num_punc_classes)
    batch = dl.generate(train=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["ids"]))
    state = ASRTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer(config["optimizer_config"]))
    train_step = make_punc_train_step(model)
    eval_step = make_punc_eval_step(model)

    rc = config["running_config"] or {}
    log_interval = rc["log_interval_steps"] or 100
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
