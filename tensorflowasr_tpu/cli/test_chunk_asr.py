"""Chunk-streaming decode CLI — parity with the reference
test_chunk_asr.py: stream one wav through the fused chunk session AND
decode it offline, printing both (the streaming-vs-offline consistency
check, :126-139) with per-chunk timing."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.cli.common import (
    build_featurizers,
    config_parser,
    load_config,
)


def main(argv=None) -> int:
    parser = config_parser(__doc__)
    parser.add_argument("--wav", required=True)
    parser.add_argument("--export_native", default=None, metavar="DIR",
                        help="also write the raw-tensor artifact for the "
                             "standalone C++ chunk-streaming engine "
                             "(cpp/serving asr_chunk) to DIR")
    parser.add_argument("--export_savedmodel", default=None, metavar="DIR",
                        help="also write the stateful picker/decoder TF "
                             "SavedModel pair (the reference's consumable "
                             "streaming-export layout; ONNX via tf2onnx) "
                             "to DIR")
    args = parser.parse_args(argv)
    config = load_config(args)
    phone_f, char_f, _, _, _ = build_featurizers(config)

    from tensorflowasr_tpu.serve.chunk_session import ChunkStreamSession
    from tensorflowasr_tpu.train.chunk_trainer import ChunkTrainer
    from tensorflowasr_tpu.utils.audio import read_wav

    trainer = ChunkTrainer(config, phone_f.num_classes, char_f.num_classes,
                           compute_dtype=args.compute_dtype)
    cfg = trainer.model_cfg
    wav, _ = read_wav(args.wav, target_sr=cfg.sample_rate)
    cs = cfg.chunk_samples
    n_chunks = max(1, -(-len(wav) // cs))
    padded = np.zeros((n_chunks * cs,), np.float32)
    padded[:len(wav)] = wav

    example = {
        "wav": padded[None, :],
        "extra_phones": np.ones((1, 8), np.int32),
    }
    trainer.init_state(example)
    if not trainer.restore():
        print("warning: no checkpoint found; decoding with random init",
              file=sys.stderr)
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats is not None:
        variables["batch_stats"] = trainer.state.batch_stats

    if args.export_native:
        from tensorflowasr_tpu.export.native_export import (
            export_native_chunk)

        export_native_chunk(
            trainer.model, variables, args.export_native,
            phone_vocab=(config.section("inp_config") or {})["vocabulary"],
            char_vocab=(config.section("tar_config") or {})["vocabulary"])
        print(f"native chunk artifact written to {args.export_native}")

    if args.export_savedmodel:
        from tensorflowasr_tpu.export.tf_export import (
            export_savedmodel_chunk_streaming)

        export_savedmodel_chunk_streaming(trainer.model, variables,
                                          args.export_savedmodel)
        print(f"stateful SavedModel pair written to "
              f"{args.export_savedmodel}")

    # offline decode
    char_ids, char_lens, ph_ids, ph_lens = trainer.predict_step(
        trainer.state, jnp.asarray(padded[None, :]),
        jnp.asarray([n_chunks * cfg.sub_length], jnp.int32))
    off_phones = phone_f.iextract(
        list(np.asarray(ph_ids)[0, :int(ph_lens[0])]))
    off_chars = char_f.iextract(
        list(np.asarray(char_ids)[0, :int(char_lens[0])]))
    print("offline phones:", " ".join(off_phones))
    print("offline chars :", "".join(off_chars))

    # streaming decode
    session = ChunkStreamSession(trainer.model, variables,
                                 phone_featurizer=phone_f,
                                 text_featurizer=char_f)
    t0 = time.perf_counter()
    session.feed(padded[:cs])          # includes compile
    compile_s = time.perf_counter() - t0
    session.reset()
    chunk_ms = []
    for i in range(n_chunks):
        t0 = time.perf_counter()
        session.feed(padded[i * cs:(i + 1) * cs])
        chunk_ms.append((time.perf_counter() - t0) * 1000)
    out = session.flush()
    dt = sum(chunk_ms) / 1000
    audio = len(wav) / cfg.sample_rate
    print("stream  phones:", " ".join(out.get("phones", [])))
    print("stream  chars :", out.get("text", ""))
    print(f"audio {audio:.2f}s stream {dt * 1000:.0f}ms "
          f"RTF {dt / max(audio, 1e-9):.4f} per-chunk "
          f"mean {np.mean(chunk_ms):.1f}ms max {np.max(chunk_ms):.1f}ms "
          f"(first chunk incl compile {compile_s:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
