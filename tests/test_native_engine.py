"""Standalone C++ inference parity (VERDICT round-1 item 6): the native
engine (cpp/serving asr_offline) must reproduce the JAX offline pipeline
— phone logits to tolerance, greedy phone ids and translated char ids
EXACTLY — from the raw-tensor artifact, with no Python at runtime."""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPP_DIR = os.path.join(REPO, "cpp", "serving")


@pytest.fixture(scope="module")
def cpp_build(tmp_path_factory):
    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    build = str(tmp_path_factory.mktemp("nativebuild"))
    gen = ["-G", "Ninja"] if shutil.which("ninja") else []
    subprocess.run(["cmake", "-S", CPP_DIR, "-B", build] + gen,
                   check=True, capture_output=True)
    subprocess.run(["cmake", "--build", build], check=True,
                   capture_output=True)
    return build


@pytest.mark.parametrize("scan_layers", [False, True])
def test_native_engine_matches_jax(cpp_build, tmp_path, scan_layers):
    from tensorflowasr_tpu.export.native_export import export_native
    from tensorflowasr_tpu.models.conformer import (
        ConformerCTC, ConformerConfig)
    from tensorflowasr_tpu.ops.ctc import ctc_greedy_decode
    from tensorflowasr_tpu.utils.audio import write_wav

    sr = 16000
    cfg = ConformerConfig(dmodel=32, num_blocks=2, head_size=8,
                          num_heads=2, kernel_size=8, dropout=0.0,
                          ctcdecoder_dropout=0.0, translator_dropout=0.0,
                          ctcdecoder_num_blocks=1, translator_num_blocks=1,
                          n_mels=40, scan_layers=scan_layers)
    n_phone, n_char = 8, 12
    model = ConformerCTC(cfg, n_phone, n_char)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 8000), jnp.float32),
                           jnp.ones((1, 4), jnp.int32))

    # vocab files so asr_offline also prints text
    phones = ["a", "b", "c", "d", "e", "f", "g"]
    chars = ["<S>", "</S>"] + list("qrstuvwxyz")
    pv = tmp_path / "phones.txt"
    cv = tmp_path / "chars.txt"
    pv.write_text("\n".join(phones), encoding="utf-8")
    cv.write_text("\n".join(chars), encoding="utf-8")

    outdir = str(tmp_path / "artifact")
    export_native(model, variables, outdir, phone_vocab=str(pv),
                  char_vocab=str(cv))

    rng = np.random.default_rng(0)
    t = np.arange(sr)
    wav = (0.4 * np.sin(2 * np.pi * 400 * t / sr) +
           0.1 * rng.standard_normal(sr)).astype(np.float32)
    wav_path = str(tmp_path / "x.wav")
    write_wav(wav_path, wav, sr)

    # JAX reference on the SAME samples the binary reads back (int16 wav
    # round trip)
    from tensorflowasr_tpu.utils.audio import read_wav
    wav_rt, _ = read_wav(wav_path)
    wav_rt = wav_rt / np.abs(wav_rt).max()
    enc = model.apply(variables, wav_rt[None], method=ConformerCTC.encode)
    logits = model.apply(variables, enc, method=ConformerCTC.ctc_logits)
    in_len = jnp.asarray([logits.shape[1]], jnp.int32)
    ids, lens = ctc_greedy_decode(logits, in_len, blank_id=n_phone - 1)
    phone_ids = list(np.asarray(ids)[0][:int(lens[0])])
    padded = jnp.concatenate(
        [ids[:, :int(lens[0])],
         jnp.zeros((1, 10), ids.dtype)], axis=1)
    char_logits = model.apply(variables, padded, enc,
                              method=ConformerCTC.translate)
    char_ids = list(np.asarray(jnp.argmax(char_logits, -1))[0])

    dump = str(tmp_path / "logits.bin")
    out = subprocess.run(
        [os.path.join(cpp_build, "asr_offline"), outdir, wav_path,
         "--dump", dump],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr

    with open(dump, "rb") as f:
        tt, vv = np.frombuffer(f.read(8), np.int32)
        native_logits = np.frombuffer(f.read(), np.float32).reshape(tt, vv)
    jl = np.asarray(logits)[0]
    assert native_logits.shape == jl.shape
    np.testing.assert_allclose(native_logits, jl, atol=2e-3, rtol=1e-3)

    lines = {l.split(":")[0]: l.split(":", 1)[1].split()
             for l in out.stdout.splitlines() if ":" in l}
    assert [int(i) for i in lines["phone_ids"]] == [int(i) for i in
                                                    phone_ids]
    assert [int(i) for i in lines["char_ids"]] == [int(i) for i in
                                                   char_ids]
    assert "text" in lines


def test_native_engine_quantized_token_parity(cpp_build, tmp_path):
    """--bf16/--int8 weight storage must decode the same tokens as f32.

    Uses a config big enough that kernels actually cross the re-encode
    size threshold (ReencodeWeights quantizes only >=16384-elem 2-D
    matrices), unlike the tiny parity fixture above."""
    from tensorflowasr_tpu.export.native_export import export_native
    from tensorflowasr_tpu.models.conformer import (
        ConformerCTC, ConformerConfig)
    from tensorflowasr_tpu.utils.audio import write_wav

    sr = 16000
    cfg = ConformerConfig(dmodel=64, num_blocks=2, head_size=16,
                          num_heads=4, kernel_size=8, dropout=0.0,
                          ctcdecoder_dropout=0.0, translator_dropout=0.0,
                          ctcdecoder_num_blocks=1, translator_num_blocks=1,
                          n_mels=40)
    model = ConformerCTC(cfg, 8, 12)
    variables = model.init(jax.random.PRNGKey(5),
                           jnp.zeros((1, 8000), jnp.float32),
                           jnp.ones((1, 4), jnp.int32))
    outdir = str(tmp_path / "artifact")
    export_native(model, variables, outdir)

    rng = np.random.default_rng(7)
    t = np.arange(sr)
    wav = (0.4 * np.sin(2 * np.pi * 300 * t / sr) +
           0.1 * rng.standard_normal(sr)).astype(np.float32)
    wav_path = str(tmp_path / "x.wav")
    write_wav(wav_path, wav, sr)

    def run(extra):
        out = subprocess.run(
            [os.path.join(cpp_build, "asr_offline"), outdir, wav_path]
            + extra, capture_output=True, text=True)
        assert out.returncode == 0, out.stderr
        return {l.split(":")[0]: l.split(":", 1)[1]
                for l in out.stdout.splitlines() if ":" in l}

    want = run([])
    for flag in ("--bf16", "--int8"):
        got = run([flag])
        assert got["phone_ids"] == want["phone_ids"], flag
        assert got["char_ids"] == want["char_ids"], flag
