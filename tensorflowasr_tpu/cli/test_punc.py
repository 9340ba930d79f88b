"""Punctuation-recovery demo CLI — parity with the reference test_punc.py:
read plain text lines (argument or stdin), print them with punctuation
restored."""

from __future__ import annotations

import sys

from tensorflowasr_tpu.cli.common import (
    build_punc_model,
    config_parser,
    load_config,
    restore_or_warn,
)


def main(argv=None) -> int:
    parser = config_parser(__doc__)
    parser.add_argument("--text", default=None,
                        help="text to punctuate (default: read stdin lines)")
    parser.add_argument("--threshold", type=float, default=0.8,
                        help="insertion probability threshold "
                             "(reference test_punc.py uses 0.8)")
    args = parser.parse_args(argv)
    config = load_config(args)

    from tensorflowasr_tpu.serve.engines import PuncEngine

    char_f, dl, model, state = build_punc_model(config)
    state = restore_or_warn(state, config.section("running_config")["outdir"],
                            "punctuation")
    variables = {"params": state.params}
    engine = PuncEngine(model, variables, char_f, dl.punc_tokens,
                        threshold=args.threshold)

    def run(line: str):
        print("".join(engine.punc_recover(list(line.strip()))))

    if args.text is not None:
        run(args.text)
    else:
        for line in sys.stdin:
            if line.strip():
                run(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
