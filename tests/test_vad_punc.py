"""VAD + punctuation subsystem tests: shapes, STFT loss golden vs
tf.signal, train-step descent, punc decision rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.models.punc import PuncConfig, PuncTransformer
from tensorflowasr_tpu.models.vad import OfflineVAD, OnlineVAD
from tensorflowasr_tpu.ops.stft_loss import (
    multi_resolution_stft_loss,
    stft_magnitude,
)
from tensorflowasr_tpu.train.state import ASRTrainState, make_optimizer


def test_stft_magnitude_matches_tf_signal():
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2000)).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(x), 600, 120, 1024))
    theirs = np.abs(tf.signal.stft(x, frame_length=600, frame_step=120,
                                   fft_length=1024).numpy())
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)


def test_multi_res_stft_loss_zero_for_identical():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    loss_same = float(multi_resolution_stft_loss(x, x))
    loss_diff = float(multi_resolution_stft_loss(
        x, x + 0.5 * jnp.asarray(
            rng.standard_normal((2, 4000)).astype(np.float32))))
    assert loss_same < 1e-4
    assert loss_diff > loss_same


def test_multi_res_stft_loss_grad_finite_for_identical_and_silence():
    """Regression: jnp.linalg.norm's backward is 0/0 = NaN when the
    spectra match exactly — hit by all-silence streaming windows (both
    magnitudes collapse to the identical floor constant); NaN'd VAD
    training within 100 steps on the round-4 corpus."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    zeros = jnp.zeros((2, 4000), jnp.float32)

    import jax

    g = jax.grad(lambda y: multi_resolution_stft_loss(x, y))(x)
    assert bool(jnp.isfinite(g).all())
    g0 = jax.grad(lambda y: multi_resolution_stft_loss(zeros, y))(zeros)
    assert bool(jnp.isfinite(g0).all())


@pytest.mark.parametrize("cls", [OnlineVAD, OfflineVAD])
def test_vad_shapes_and_params(cls):
    model = cls(dmodel=32, frame_input=80)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 40, 80)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, masked = model.apply(variables, x)
    assert logits.shape == (2, 40, 1)
    assert masked.shape == (2, 40, 80)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
    assert n < 150_000, n   # reference: ~80K params


def test_online_vad_is_causal():
    """Changing future frames must not change past logits."""
    model = OnlineVAD(dmodel=16, frame_input=80)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 30, 80)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    l1, _ = model.apply(variables, x)
    x2 = x.at[:, 20:].set(0.0)
    l2, _ = model.apply(variables, x2)
    np.testing.assert_allclose(np.asarray(l1)[:, :20],
                               np.asarray(l2)[:, :20], atol=1e-5)


def test_vad_train_step_descends():
    from tensorflowasr_tpu.train.vad_trainer import (
        make_vad_eval_step, make_vad_train_step)

    model = OnlineVAD(dmodel=16, frame_input=80)
    rng = np.random.default_rng(4)
    voiced = rng.standard_normal((2, 20, 80)).astype(np.float32)
    silent = rng.standard_normal((2, 20, 80)).astype(np.float32) * 0.01
    x = np.concatenate([voiced, silent], axis=1)
    labels = np.concatenate([np.ones((2, 20, 1)), np.zeros((2, 20, 1))],
                            axis=1).astype(np.float32)
    batch = {"x": jnp.asarray(x), "labels": jnp.asarray(labels),
             "wav_target": jnp.asarray(x)}
    variables = model.init(jax.random.PRNGKey(0), batch["x"])
    state = ASRTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer({"lr": 3e-3}))
    step = make_vad_train_step(model, donate=False, global_batch=2)
    losses = []
    for _ in range(10):
        state, m = step(state, batch)
        losses.append(float(m["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    em = make_vad_eval_step(model)(state, batch)
    assert 0.0 <= float(em["f1"]) <= 1.0


def test_streaming_reshape():
    from tensorflowasr_tpu.train.vad_trainer import streaming_reshape

    rng = np.random.default_rng(5)
    batch = {"x": rng.standard_normal((2, 12, 80)).astype(np.float32),
             "labels": np.ones((2, 12, 1), np.float32),
             "wav_target": rng.standard_normal((2, 12, 80)).astype(
                 np.float32)}
    out = streaming_reshape(batch, min_frames=3, rng=rng)
    n = out["x"].shape[1]
    assert 12 % n == 0
    assert out["x"].shape[0] == 2 * (12 // n)
    assert out["x"].size == batch["x"].size


def test_punc_transformer_shapes_and_train():
    from tensorflowasr_tpu.train.punc_trainer import (
        make_punc_train_step, punc_recover_ids)

    cfg = PuncConfig(num_layers=2, d_model=32, embedding_dim=32,
                     num_heads=4, dff=32, pe_input=128)
    model = PuncTransformer(cfg, vocab_size=50, num_punc_classes=6)
    rng = np.random.default_rng(6)
    ids = rng.integers(1, 50, (2, 16)).astype(np.int32)
    ids[:, -4:] = 0                        # pad tail
    labels = rng.integers(1, 6, (2, 16)).astype(np.int32)
    labels[:, -4:] = 0
    feats = rng.standard_normal((2, 16, 768)).astype(np.float32)
    feats[:, -4:] = -10.0
    batch = {"ids": jnp.asarray(ids), "punc_labels": jnp.asarray(labels),
             "bert_features": jnp.asarray(feats)}
    variables = model.init(jax.random.PRNGKey(0), batch["ids"])
    logits, bert_out = model.apply(variables, batch["ids"])
    assert logits.shape == (2, 16, 6)
    assert bert_out.shape == (2, 16, 768)

    state = ASRTrainState.create(
        apply_fn=model.apply, params=variables["params"],
        tx=make_optimizer({"lr": 3e-3}))
    step = make_punc_train_step(model, donate=False)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        state, m = step(state, batch, key)
        losses.append(float(m["train_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    decisions = punc_recover_ids(logits)
    assert decisions.shape == (2, 16)
    assert np.all(np.asarray(decisions) >= 0)


def test_punc_loader_windows_long_lines(tmp_path):
    """Lines past max_len-2 chars split into windows instead of losing
    the tail (round-1 weak item 8)."""
    from tensorflowasr_tpu.data.punc_dataloader import PuncDataLoader
    from tensorflowasr_tpu.utils.text import TextFeaturizer

    (tmp_path / "chars.txt").write_text(
        "\n".join(["<S>", "</S>"] + list("abcdef")), encoding="utf-8")
    long_line = "abcdef" * 20 + "。"       # 120 chars
    (tmp_path / "punc.list").write_text(long_line + "\n",
                                        encoding="utf-8")
    char_f = TextFeaturizer({"vocabulary": str(tmp_path / "chars.txt"),
                             "blank_at_zero": True})
    config = {"running_config": {
        "train_list": str(tmp_path / "punc.list"),
        "eval_list": str(tmp_path / "punc.list"),
        "batch_size": 4, "outdir": None}}
    dl = PuncDataLoader(config, char_f, ["，", "。"], max_len=32)
    windows = dl.encode_windows(long_line)
    assert len(windows) == 4               # ceil(120 / 30)
    total_chars = sum(len(ids) - 2 for ids, _ in windows)
    assert total_chars == 120              # nothing truncated
    # last char's label carries the 。 (label >= 2) in the LAST window
    last_ids, last_labs = windows[-1]
    assert last_labs[len(last_ids) - 2] >= 2
    batch = dl.generate(True)
    assert batch["ids"].shape == (4, 32)


def test_punc_param_count():
    cfg = PuncConfig()
    model = PuncTransformer(cfg, vocab_size=5038, num_punc_classes=33)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, 8), jnp.int32))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
    # reference quotes ~600K; embedding 5038*64 + bert projector dominate
    assert 400_000 < n < 1_200_000, n
