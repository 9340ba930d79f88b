"""VAD evaluation CLI — parity with the reference eval_vad.py: frame
accuracy + F1 over the eval list (restores the newest checkpoint)."""

from __future__ import annotations

import json
import sys

from tensorflowasr_tpu.cli.common import (
    build_vad_model,
    config_parser,
    load_config,
    restore_or_warn,
)


def main(argv=None) -> int:
    parser = config_parser(__doc__)
    parser.add_argument("--max_batches", type=int, default=50)
    parser.add_argument("--export_native", default=None, metavar="DIR",
                        help="also write the raw-tensor artifact for the "
                             "standalone C++ VAD (asr_vad / asr_offline "
                             "--vad / asr_chunk --vad)")
    args = parser.parse_args(argv)
    config = load_config(args)

    from tensorflowasr_tpu.data.vad_dataloader import VADDataLoader
    from tensorflowasr_tpu.eval.testers import VADTester
    from tensorflowasr_tpu.train.vad_trainer import make_vad_eval_step

    dl = VADDataLoader(config)
    model, state = build_vad_model(config)
    state = restore_or_warn(state, config.section("running_config")["outdir"],
                            "VAD")
    if args.export_native:
        from tensorflowasr_tpu.export.native_export import export_native_vad

        export_native_vad(model, {"params": state.params},
                          args.export_native)
        print(f"native VAD artifact written to {args.export_native}")
    tester = VADTester(make_vad_eval_step(model), state)
    result = tester.run(dl.generator(train=False),
                        max_batches=args.max_batches)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
