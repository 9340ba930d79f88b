"""Punctuation-model evaluation CLI — parity with the reference
eval_punc.py: masked punctuation accuracy over the eval list."""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

from tensorflowasr_tpu.cli.common import config_parser, load_config


def main(argv=None) -> int:
    parser = config_parser(__doc__)
    parser.add_argument("--max_batches", type=int, default=50)
    args = parser.parse_args(argv)
    config = load_config(args)

    from tensorflowasr_tpu.data.punc_dataloader import PuncDataLoader
    from tensorflowasr_tpu.eval.testers import PuncTester
    from tensorflowasr_tpu.models.punc import PuncConfig, PuncTransformer
    from tensorflowasr_tpu.train.punc_trainer import make_punc_eval_step
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
    dl = PuncDataLoader(config, char_f, punc_tokens)
    model = PuncTransformer(PuncConfig.from_user_config(config),
                            char_f.num_classes, dl.num_punc_classes)
    batch = dl.generate(train=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch["ids"]))
    state = ASRTrainState.create(apply_fn=model.apply,
                                 params=variables["params"],
                                 tx=make_optimizer({}))
    tester = PuncTester(make_punc_eval_step(model), state)
    result = tester.run(dl.generator(train=False),
                        max_batches=args.max_batches)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
