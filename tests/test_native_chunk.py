"""Standalone native CHUNK-STREAMING engine parity: export a tiny
ChunkConformer, stream a wav through the C++ `asr_chunk` binary (no
Python at runtime), and require token-for-token agreement with the JAX
ChunkStreamSession."""

import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_chunk import N_CHAR, N_PHONE, tiny_cfg
from tensorflowasr_tpu.models.chunk_conformer import ChunkConformer
from tensorflowasr_tpu.export.native_export import export_native_chunk
from tensorflowasr_tpu.serve.chunk_session import ChunkStreamSession
from tensorflowasr_tpu.utils.audio import write_wav

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPP_DIR = os.path.join(REPO, "cpp", "serving")


@pytest.fixture(scope="module")
def cpp_build(tmp_path_factory):
    if shutil.which("cmake") is None:
        pytest.skip("cmake not available")
    build = str(tmp_path_factory.mktemp("cppbuild"))
    gen = ["-G", "Ninja"] if shutil.which("ninja") else []
    subprocess.run(["cmake", "-S", CPP_DIR, "-B", build] + gen,
                   check=True, capture_output=True)
    subprocess.run(["cmake", "--build", build], check=True,
                   capture_output=True)
    return build


def _train_chunk_fixture(model, cfg, steps=800):
    # 800: the round-5 glorot/keras init parity changed the tiny
    # fixture's 400-step overfit enough to drop a phone token —
    # train until the decode is decisive again
    """Overfit two tone utterances so logits have decisive gaps: the
    bf16/int8 variants compare a quantized C++ decode against the f32 JAX
    session, so a random-init fixture's near-tie argmaxes would make
    token-for-token parity a coin flip (that flakiness shipped round 2's
    offline sibling test red). Returns trained variables + the wav."""
    from tensorflowasr_tpu.train.chunk_trainer import make_chunk_train_step
    from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer

    t = np.arange(3 * cfg.chunk_samples) / cfg.sample_rate
    wav2 = np.stack([
        0.95 * np.sin(2 * np.pi * 220 * t),
        0.95 * np.sin(2 * np.pi * 550 * t) *
        np.sign(np.sin(2 * np.pi * 3 * t)),
    ]).astype(np.float32)
    b = 2
    batch = {
        "wav": jnp.asarray(wav2),
        "input_length": jnp.full((b,), 3 * cfg.sub_length, jnp.int32),
        "phones": jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32),
        "phone_length": jnp.full((b,), 3, jnp.int32),
        "chars": jnp.asarray([[2, 3, 4], [5, 6, 7]], jnp.int32),
        "char_length": jnp.full((b,), 3, jnp.int32),
        "extra_phones": jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32),
        "extra_phone_length": jnp.full((b,), 3, jnp.int32),
        "extra_chars": jnp.asarray([[2, 3, 4], [5, 6, 7]], jnp.int32),
        "extra_char_length": jnp.full((b,), 3, jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch["wav"],
                           batch["extra_phones"], 8, False,
                           method=ChunkConformer.train_forward)
    tx = make_optimizer({"lr": 3e-3})
    state = ASRTrainState.create(apply_fn=model.apply,
                                 params=variables["params"], tx=tx,
                                 batch_stats=variables.get("batch_stats"))
    step = make_chunk_train_step(model, max_pick=8, donate=False)
    key = jax.random.PRNGKey(1)
    for _ in range(steps):
        state, metrics = step(state, batch, key)
    assert float(metrics["phone_acc"]) > 0.99  # fixture IS decisive
    trained = {"params": state.params}
    if state.batch_stats is not None:
        trained["batch_stats"] = state.batch_stats
    return trained, wav2[0]


@pytest.mark.parametrize("variant",
                         ["base", "picker_wb2", "lookahead_all", "bf16",
                          "int8"])
def test_native_chunk_stream_parity(cpp_build, tmp_path, variant):
    """Token-for-token C++/JAX agreement; the ``bf16``/``int8`` variants
    run the engine with reduced-width weight storage (native_math.h /
    Int8Tensor) on a TRAINED fixture (decisive logit gaps), with
    ASR_REENCODE_MIN lowering the quantizer's size floor so the tiny
    fixture's kernels actually cross it — without the hook, int8 mode
    quantized ZERO tensors here and the variant tested nothing."""
    import dataclasses

    cfg = tiny_cfg()
    if variant == "picker_wb2":
        cfg = dataclasses.replace(
            cfg, picker=dataclasses.replace(cfg.picker, win_back=2))
    elif variant == "lookahead_all":
        # lookahead on every stack, incl. a multi-block encoder (exact
        # num_blocks*win_back ring semantics in BOTH engines)
        from tests.test_chunk import _lookahead_cfg
        cfg = _lookahead_cfg()
    model = ChunkConformer(cfg, N_PHONE, N_CHAR)
    quantized = variant in ("bf16", "int8")
    trained_wav = None
    if quantized:
        variables, trained_wav = _train_chunk_fixture(model, cfg)
    else:
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

    if trained_wav is not None:
        wav = trained_wav  # decode a TRAINED utterance: decisive tokens
    else:
        rng = np.random.default_rng(11)
        wav = rng.standard_normal((4 * cfg.chunk_samples,)).astype(
            np.float32) * 0.1
    wav_path = tmp_path / "utt.wav"
    write_wav(str(wav_path), wav, cfg.sample_rate)

    # JAX reference decode (through the round-tripped wav so both engines
    # consume identical samples)
    from tensorflowasr_tpu.utils.audio import read_wav
    wav_rt, _ = read_wav(str(wav_path), target_sr=cfg.sample_rate)
    sess = ChunkStreamSession(model, variables)
    sess.feed(wav_rt)
    want = sess.flush()

    cmd = [os.path.join(cpp_build, "asr_chunk"), str(artifact),
           str(wav_path), "--quiet"]
    env = dict(os.environ)
    if variant == "bf16":
        cmd.append("--bf16")
    elif variant == "int8":
        cmd.append("--int8")
    if quantized:
        env["ASR_REENCODE_MIN"] = "256"  # tiny fixture: force quantization
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=300,
                         env=env)
    assert out.returncode == 0, out.stderr

    lines = {ln.split("]")[0][1:]: ln.split("]", 1)[1].strip()
             for ln in out.stdout.splitlines() if ln.startswith("[")}
    got_phones = lines.get("phones", "").split()
    got_chars = [int(x) for x in lines.get("chars", "").split()]

    if quantized:  # non-vacuous: the trained utterance decodes its labels
        assert list(want["phone_ids"]) == [1, 2, 3], want["phone_ids"]
    want_phones = [f"p{i}" for i in want["phone_ids"]]
    assert got_phones == want_phones, (got_phones, want_phones)
    assert got_chars == want["char_ids"], (got_chars, want["char_ids"])

    # text line must match the tokener mapping of the char ids
    want_text = "".join(tokens[i] for i in want["char_ids"]
                        if tokens[i] not in ("<S>", "</S>"))
    assert lines.get("final", "") == want_text
