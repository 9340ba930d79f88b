"""Standalone native VAD (cpp/serving vad_native_model):

- per-frame probability PARITY with the JAX OnlineVAD,
- offline segmentation (merge/resplit — OfflineVAD.recover semantics),
- VAD-gated chunk streaming in asr_chunk (the reference C++ session's
  start/stop behavior, asr_session.cpp:171-261).
"""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.export.native_export import export_native_vad
from tensorflowasr_tpu.models.vad import OnlineVAD
from tensorflowasr_tpu.utils.audio import write_wav

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPP_DIR = os.path.join(REPO, "cpp", "serving")


@pytest.fixture(scope="module")
def cpp_build(tmp_path_factory):
    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    build = str(tmp_path_factory.mktemp("vadbuild"))
    gen = ["-G", "Ninja"] if shutil.which("ninja") else []
    subprocess.run(["cmake", "-S", CPP_DIR, "-B", build] + gen,
                   check=True, capture_output=True)
    subprocess.run(["cmake", "--build", build], check=True,
                   capture_output=True)
    return build


def _const_vad_artifact(outdir: str, logit: float,
                        frame_input: int = 80) -> None:
    """Artifact whose every frame prob is sigmoid(logit) — all kernels
    zero, fc bias set: deterministic always-voiced / always-silent VADs
    for exercising the gating paths."""
    model = OnlineVAD(frame_input=frame_input)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, frame_input), jnp.float32))
    params = jax.tree.map(np.zeros_like, variables["params"])
    params["fc"]["bias"] = np.asarray([logit], np.float32)
    export_native_vad(model, {"params": params}, outdir)


def test_probs_parity_with_jax(cpp_build, tmp_path):
    model = OnlineVAD()
    variables = model.init(jax.random.PRNGKey(7),
                           jnp.zeros((1, 4, 80), jnp.float32))
    outdir = str(tmp_path / "vad")
    export_native_vad(model, variables, outdir)

    sr = 16000
    rng = np.random.default_rng(0)
    wav = (0.3 * rng.standard_normal(sr)).astype(np.float32)
    wav_path = str(tmp_path / "x.wav")
    write_wav(wav_path, wav, sr)

    # JAX reference on the round-tripped samples, 2x downsampled
    from tensorflowasr_tpu.utils.audio import read_wav
    wav_rt, _ = read_wav(wav_path)
    ds = wav_rt[::2]
    n_frames = len(ds) // 80
    frames = ds[:n_frames * 80].reshape(1, n_frames, 80)
    logits = model.apply(variables, jnp.asarray(frames),
                         method=OnlineVAD.infer)
    want = np.asarray(jax.nn.sigmoid(logits[0, :, 0]))

    dump = str(tmp_path / "probs.bin")
    out = subprocess.run(
        [os.path.join(cpp_build, "asr_vad"), outdir, wav_path,
         "--dump", dump],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    with open(dump, "rb") as f:
        n = np.frombuffer(f.read(4), np.int32)[0]
        got = np.frombuffer(f.read(), np.float32)
    assert n == n_frames
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_segments_merge_and_resplit(cpp_build, tmp_path):
    # always-voiced VAD on a 35 s wav -> one segment resplit at 15 s
    vad_dir = str(tmp_path / "vad_on")
    _const_vad_artifact(vad_dir, +5.0)
    sr = 16000
    wav = np.full(35 * sr, 0.1, np.float32)
    wav_path = str(tmp_path / "long.wav")
    write_wav(wav_path, wav, sr)
    out = subprocess.run(
        [os.path.join(cpp_build, "asr_vad"), vad_dir, wav_path],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    seg_line = [l for l in out.stdout.splitlines()
                if l.startswith("segments:")][0]
    spans = [tuple(float(x) for x in s.split("-"))
             for s in seg_line.split()[1:]]
    assert len(spans) == 3, spans                      # 15 + 15 + 5
    assert abs(spans[0][1] - spans[0][0] - 15.0) < 0.2
    assert abs(spans[2][1] - 35.0) < 0.2

    # always-silent VAD -> no segments
    vad_off = str(tmp_path / "vad_off")
    _const_vad_artifact(vad_off, -5.0)
    out = subprocess.run(
        [os.path.join(cpp_build, "asr_vad"), vad_off, wav_path],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "segments:\n" in out.stdout or \
        out.stdout.strip().endswith("segments:")


def test_chunk_engine_vad_gating(cpp_build, tmp_path):
    """asr_chunk --vad: always-voiced VAD reproduces the ungated decode;
    always-silent VAD produces no output (and skips model compute)."""
    from tests.test_chunk import N_CHAR, N_PHONE, tiny_cfg
    from tensorflowasr_tpu.export.native_export import export_native_chunk
    from tensorflowasr_tpu.models.chunk_conformer import ChunkConformer

    cfg = tiny_cfg()
    model = ChunkConformer(cfg, N_PHONE, N_CHAR)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.chunk_samples), jnp.float32),
        jnp.ones((1, 4), jnp.int32), 8, False,
        method=ChunkConformer.train_forward)

    artifact = tmp_path / "artifact"
    phone_vocab = tmp_path / "phones.txt"
    phone_vocab.write_text("\n".join(f"p{i}" for i in range(N_PHONE - 1)),
                           encoding="utf-8")
    char_vocab = tmp_path / "chars.txt"
    tokens = ["<S>", "</S>"] + [f"c{i}" for i in range(N_CHAR - 3)]
    char_vocab.write_text("\n".join(tokens), encoding="utf-8")
    export_native_chunk(model, variables, str(artifact),
                        phone_vocab=str(phone_vocab),
                        char_vocab=str(char_vocab))

    rng = np.random.default_rng(11)
    wav = rng.standard_normal((4 * cfg.chunk_samples,)).astype(
        np.float32) * 0.1
    wav_path = tmp_path / "utt.wav"
    write_wav(str(wav_path), wav, cfg.sample_rate)

    vad_on = str(tmp_path / "vad_on")
    _const_vad_artifact(vad_on, +5.0)
    vad_off = str(tmp_path / "vad_off")
    _const_vad_artifact(vad_off, -5.0)

    base = subprocess.run(
        [os.path.join(cpp_build, "asr_chunk"), str(artifact),
         str(wav_path), "--quiet"],
        capture_output=True, text=True, timeout=300)
    assert base.returncode == 0, base.stderr

    gated = subprocess.run(
        [os.path.join(cpp_build, "asr_chunk"), str(artifact),
         str(wav_path), "--quiet", "--vad", vad_on],
        capture_output=True, text=True, timeout=300)
    assert gated.returncode == 0, gated.stderr
    # always-voiced gating never interrupts: identical final output.
    # [decode_seconds] is wall-clock metadata, not decode output — drop it.
    def _decode_lines(out):
        return [ln for ln in out.splitlines()
                if not ln.startswith("[decode_seconds]")]

    assert _decode_lines(gated.stdout) == _decode_lines(base.stdout)

    silent = subprocess.run(
        [os.path.join(cpp_build, "asr_chunk"), str(artifact),
         str(wav_path), "--quiet", "--vad", vad_off],
        capture_output=True, text=True, timeout=300)
    assert silent.returncode == 0, silent.stderr
    lines = {ln.split("]")[0][1:]: ln.split("]", 1)[1].strip()
             for ln in silent.stdout.splitlines() if ln.startswith("[")}
    assert lines.get("phones", "") == ""
    assert lines.get("final", "") == ""


def test_offline_engine_vad_segmentation(cpp_build, tmp_path):
    """asr_offline --vad: always-voiced VAD -> one segment covering the
    wav; the segment text equals the ungated decode's text."""
    from tensorflowasr_tpu.export.native_export import export_native
    from tensorflowasr_tpu.models.conformer import (ConformerCTC,
                                                    ConformerConfig)

    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                          kernel_size=8, dropout=0.0,
                          ctcdecoder_dropout=0.0, translator_dropout=0.0,
                          ctcdecoder_num_blocks=1, translator_num_blocks=1,
                          n_mels=40)
    n_phone, n_char = 8, 12
    model = ConformerCTC(cfg, n_phone, n_char)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 8000), jnp.float32),
                           jnp.ones((1, 4), jnp.int32))
    pv = tmp_path / "phones.txt"
    pv.write_text("\n".join("abcdefg"), encoding="utf-8")
    cv = tmp_path / "chars.txt"
    cv.write_text("\n".join(["<S>", "</S>"] + list("qrstuvwxyz")),
                  encoding="utf-8")
    outdir = str(tmp_path / "am")
    export_native(model, variables, outdir, phone_vocab=str(pv),
                  char_vocab=str(cv))

    sr = 16000
    t = np.arange(sr)
    wav = (0.4 * np.sin(2 * np.pi * 300 * t / sr)).astype(np.float32)
    wav_path = str(tmp_path / "u.wav")
    write_wav(wav_path, wav, sr)

    base = subprocess.run(
        [os.path.join(cpp_build, "asr_offline"), outdir, wav_path],
        capture_output=True, text=True, timeout=300)
    assert base.returncode == 0, base.stderr
    base_text = [l for l in base.stdout.splitlines()
                 if l.startswith("text:")][0]

    vad_on = str(tmp_path / "vad_on")
    _const_vad_artifact(vad_on, +5.0)
    seg = subprocess.run(
        [os.path.join(cpp_build, "asr_offline"), outdir, wav_path,
         "--vad", vad_on],
        capture_output=True, text=True, timeout=300)
    assert seg.returncode == 0, seg.stderr
    assert "segment 0" in seg.stdout
    seg_text = [l for l in seg.stdout.splitlines()
                if l.startswith("text:")][0]
    assert seg_text == base_text
