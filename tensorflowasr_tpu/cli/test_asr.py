"""Single-wav decode CLI — parity with the reference test_asr.py stt():
offline decode of one wav file with per-stage timing (RTF evidence), plus
the block-streaming variant when ``speech_config.streaming`` is true."""

from __future__ import annotations

import sys
import time

import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.cli.common import (
    build_featurizers,
    config_parser,
    load_config,
)


def main(argv=None) -> int:
    parser = config_parser(__doc__)
    parser.add_argument("--wav", required=True, help="wav file to decode")
    parser.add_argument("--export_native", default=None, metavar="DIR",
                        help="also write the raw-tensor artifact for the "
                             "standalone C++ engine (cpp/serving "
                             "asr_offline) to DIR")
    parser.add_argument("--export_savedmodel", default=None, metavar="DIR",
                        help="also write TF SavedModels in the "
                             "reference's 3-graph layout (encoder / "
                             "ctc_decoder / translator; ONNX is one "
                             "tf2onnx command away — see MIGRATION.md)")
    parser.add_argument("--export_durations", default="2,4,6,8",
                        help="duration buckets (s) for the SavedModel "
                             "encoder signatures")
    args = parser.parse_args(argv)
    config = load_config(args)
    phone_f, char_f, _, _, _ = build_featurizers(config)

    from tensorflowasr_tpu.train.asr_trainer import CTCTrainer
    from tensorflowasr_tpu.utils.audio import SpeechFeaturizer

    sf = SpeechFeaturizer(config["speech_config"] or {})
    wav = sf.load_wav(args.wav)
    dur = len(wav) / sf.sample_rate
    padded = sf.pad_signal(wav)
    peak = np.abs(padded).max()
    if peak > 0:
        padded = padded / peak
    # floor convention — matches the training dataloader's input_length
    # (am_dataloader._input_length); ceil would add a zero-pad frame the
    # model never saw in training
    in_len = max(1, len(wav) // (sf.hop_size * sf.reduction_factor))

    trainer = CTCTrainer(config, phone_f.num_classes, char_f.num_classes,
                         blank_id=phone_f.blank,
                         compute_dtype=args.compute_dtype)
    batch = {
        "wav": padded[None, :], "input_length": np.asarray([in_len]),
        "phones": np.zeros((1, 8), np.int32),
        "phone_length": np.asarray([1]),
        "chars": np.zeros((1, 8), np.int32), "char_length": np.asarray([1]),
    }
    trainer.init_state({k: jnp.asarray(v) for k, v in batch.items()})
    if not trainer.restore():
        print("warning: no checkpoint found; decoding with random init",
              file=sys.stderr)

    if args.export_native:
        from tensorflowasr_tpu.export.native_export import export_native

        variables = {"params": trainer.state.params}
        if trainer.state.batch_stats is not None:
            variables["batch_stats"] = trainer.state.batch_stats
        export_native(
            trainer.model, variables, args.export_native,
            phone_vocab=(config.section("inp_config") or {})["vocabulary"],
            char_vocab=(config.section("tar_config") or {})["vocabulary"])
        print(f"native artifact written to {args.export_native}")

    if args.export_savedmodel:
        from tensorflowasr_tpu.export.tf_export import (
            export_savedmodel_offline,
        )

        variables = {"params": trainer.state.params}
        if trainer.state.batch_stats is not None:
            variables["batch_stats"] = trainer.state.batch_stats
        durations = tuple(float(d) for d in
                          args.export_durations.split(","))
        export_savedmodel_offline(trainer.model, variables,
                                  args.export_savedmodel,
                                  durations=durations,
                                  sample_rate=sf.sample_rate)
        print(f"SavedModels written to {args.export_savedmodel}")

    wav_j = jnp.asarray(padded[None, :])
    len_j = jnp.asarray([in_len], jnp.int32)
    t0 = time.perf_counter()
    phone_ids, phone_lens, char_ids = trainer.predict_step(
        trainer.state, wav_j, len_j)
    phone_ids.block_until_ready()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    phone_ids, phone_lens, char_ids = trainer.predict_step(
        trainer.state, wav_j, len_j)
    phone_ids.block_until_ready()
    decode_s = time.perf_counter() - t0

    n = int(phone_lens[0])
    phones = phone_f.iextract(list(np.asarray(phone_ids)[0, :n]))
    chars = []
    for v in np.asarray(char_ids)[0]:
        if v == 0 or v == char_f.endid():
            break
        chars.append(char_f.iextract(int(v)))
    print("phones:", " ".join(phones))
    print("chars :", "".join(chars))
    print(f"audio {dur:.2f}s decode {decode_s * 1000:.1f}ms "
          f"RTF {decode_s / dur:.4f} (first call incl compile "
          f"{compile_s:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
