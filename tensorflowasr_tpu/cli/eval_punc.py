"""Punctuation-model evaluation CLI — parity with the reference
eval_punc.py: masked punctuation accuracy over the eval list (restores the
newest checkpoint)."""

from __future__ import annotations

import json
import sys

from tensorflowasr_tpu.cli.common import (
    build_punc_model,
    config_parser,
    load_config,
    restore_or_warn,
)


def main(argv=None) -> int:
    parser = config_parser(__doc__)
    parser.add_argument("--max_batches", type=int, default=50)
    args = parser.parse_args(argv)
    config = load_config(args)

    from tensorflowasr_tpu.eval.testers import PuncTester
    from tensorflowasr_tpu.train.punc_trainer import make_punc_eval_step

    _, dl, model, state = build_punc_model(config)
    state = restore_or_warn(state, config.section("running_config")["outdir"],
                            "punctuation")
    tester = PuncTester(make_punc_eval_step(model), state)
    result = tester.run(dl.generator(train=False),
                        max_batches=args.max_batches)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
