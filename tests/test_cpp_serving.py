"""C++ serving host integration: build the native client, start the JAX
model server over TCP, stream a synthetic wav through the C++ session."""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPP_DIR = os.path.join(REPO, "cpp", "serving")


def _build_cpp(tmp_path):
    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    build = os.path.join(str(tmp_path), "build")
    gen = ["-G", "Ninja"] if shutil.which("ninja") else []
    subprocess.run(["cmake", "-S", CPP_DIR, "-B", build] + gen,
                   check=True, capture_output=True)
    subprocess.run(["cmake", "--build", build], check=True,
                   capture_output=True)
    return build


@pytest.fixture(scope="module")
def cpp_build(tmp_path_factory):
    return _build_cpp(tmp_path_factory.mktemp("cppbuild"))


def test_native_unit_tests(cpp_build):
    out = subprocess.run([os.path.join(cpp_build, "serving_unit_tests")],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    assert "all native tests passed" in out.stdout


def test_cpp_session_end_to_end(cpp_build, tmp_path):
    from tensorflowasr_tpu.models.conformer import (
        ConformerCTC, ConformerConfig)
    from tensorflowasr_tpu.models.vad import OnlineVAD
    from tensorflowasr_tpu.serve.engines import ASREngine, VADEngine
    from tensorflowasr_tpu.serve.model_server import (
        ModelClient, ModelServer, build_asr_ops)
    from tensorflowasr_tpu.utils.audio import write_wav

    sr = 16000
    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                          kernel_size=8, dropout=0.0,
                          ctcdecoder_num_blocks=1, translator_num_blocks=1)
    n_phone, n_char = 8, 12
    model = ConformerCTC(cfg, n_phone, n_char)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8000), jnp.float32),
                           jnp.ones((1, 4), jnp.int32))
    asr_engine = ASREngine(model, variables, chunk_seconds=0.5,
                           sample_rate=sr)

    # energy-rule VAD stand-in with the VADEngine interface
    class EnergyVAD:
        frame_input = 80

        def inference(self, frames):
            e = np.abs(frames).mean(axis=-1).flatten()
            return np.where(e > 0.01, 1.0, -1.0).astype(np.float32)

    server = ModelServer(build_asr_ops(asr_engine, EnergyVAD()),
                         tcp_port=0)
    server.start()
    try:
        # protocol sanity via the python client first
        client = ModelClient(tcp_port=server.tcp_port)
        info = client.call("info")[0]
        assert info[0] == asr_engine.chunk_samples
        # 8000 samples = one 7680 quantum + 320 remainder (kept, not
        # truncated): chunk_frames + 1 output frames
        enc = client.call("encode",
                          np.zeros((1, 8000), np.float32))[0]
        assert enc.shape == (asr_engine.chunk_frames + 1, 32)
        logits = client.call("ctc_logits", enc)[0]
        assert logits.shape == (asr_engine.chunk_frames + 1, n_phone)
        with pytest.raises(RuntimeError):
            client.call("no_such_op", enc)
        client.close()

        # vocabs for the native tokener
        phone_vocab = tmp_path / "phones.txt"
        phone_vocab.write_text("\n".join(f"p{i}" for i in range(n_phone - 1)),
                               encoding="utf-8")
        char_vocab = tmp_path / "chars.txt"
        char_vocab.write_text(
            "\n".join(["<S>", "</S>"] + [f"c{i}" for i in range(n_char - 3)]),
            encoding="utf-8")

        # synthetic utterance: silence - tone - silence
        t = np.arange(int(1.5 * sr)) / sr
        tone = (0.6 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        wav = np.concatenate([np.zeros(sr // 2, np.float32), tone,
                              np.zeros(sr, np.float32)])
        wav_path = tmp_path / "utt.wav"
        write_wav(str(wav_path), wav, sr)

        out = subprocess.run(
            [os.path.join(cpp_build, "asr_client"),
             f"127.0.0.1:{server.tcp_port}", str(phone_vocab),
             str(char_vocab), str(wav_path)],
            capture_output=True, text=True, timeout=300)
        assert out.returncode == 0, out.stderr
        assert "[start]" in out.stdout, (out.stdout, out.stderr)
        assert "[end]" in out.stdout or "[final]" in out.stdout, out.stdout
    finally:
        server.stop()


def test_cpp_stream_client_end_to_end(cpp_build, tmp_path):
    """asr_stream (native multi-stream client): two concurrent processes
    stream different wavs through the batched slot pool; each [final]
    must equal the single-stream ChunkStreamSession text."""
    from tests.test_chunk import N_CHAR, N_PHONE, tiny_cfg
    from tensorflowasr_tpu.models.chunk_conformer import ChunkConformer
    from tensorflowasr_tpu.serve.chunk_session import ChunkStreamSession
    from tensorflowasr_tpu.serve.model_server import ModelServer
    from tensorflowasr_tpu.serve.multi_session import (
        BatchingStreamFront, MultiStreamChunkServer, build_stream_ops)
    from tensorflowasr_tpu.utils.audio import write_wav

    cfg = tiny_cfg()
    model = ChunkConformer(cfg, N_PHONE, N_CHAR)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.chunk_samples), jnp.float32),
        jnp.ones((1, 4), jnp.int32), 8, False,
        method=ChunkConformer.train_forward)

    # char vocab for the native tokener: ids map 1:1 to lines
    tokens = ["<S>", "</S>"] + [f"c{i}" for i in range(N_CHAR - 3)]
    char_vocab = tmp_path / "chars.txt"
    char_vocab.write_text("\n".join(tokens), encoding="utf-8")

    def to_text(char_ids):
        return "".join(tokens[i] for i in char_ids
                       if i < len(tokens) and tokens[i] not in
                       ("<S>", "</S>"))

    rng = np.random.default_rng(7)
    cs = cfg.chunk_samples
    wavs, paths, expected = [], [], []
    for i, n in enumerate([3 * cs, 2 * cs + cs // 2]):
        w = rng.standard_normal((n,)).astype(np.float32) * 0.1
        wavs.append(w)
        p = tmp_path / f"utt{i}.wav"
        write_wav(str(p), w, cfg.sample_rate)
        paths.append(p)
        sess = ChunkStreamSession(model, variables)
        sess.feed(w)
        expected.append(to_text(sess.flush()["char_ids"]))

    front = BatchingStreamFront(
        MultiStreamChunkServer(model, variables, n_slots=2),
        max_wait_ms=5.0)
    ops = build_stream_ops(front)
    server = ModelServer(ops, tcp_port=0, inline_exec=False,
                         inline_ops=set(ops))
    server.start()
    try:
        procs = [subprocess.Popen(
            [os.path.join(cpp_build, "asr_stream"),
             f"127.0.0.1:{server.tcp_port}", str(char_vocab), str(p)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
            for p in paths]
        for proc, want in zip(procs, expected):
            out, err = proc.communicate(timeout=300)
            assert proc.returncode == 0, err
            final = [ln for ln in out.splitlines()
                     if ln.startswith("[final]")]
            assert final, (out, err)
            assert final[0] == f"[final] {want}", (final[0], want)
    finally:
        server.stop()
        front.shutdown()
