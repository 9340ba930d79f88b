"""LEAF frontend tests: mel-matrix golden vs tf.signal, PCEN EMA vs numpy,
constraint ranges, shapes, and gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflowasr_tpu.models.leaf import (
    Leaf,
    PCEN,
    gabor_constraint,
    gabor_filters_realimag,
    gabor_params_from_mels,
    gaussian_lowpass_kernel,
    linear_to_mel_weight_matrix,
)


def test_linear_to_mel_matches_tf_signal():
    tf = pytest.importorskip("tensorflow")
    ours = linear_to_mel_weight_matrix(40, 257, 16000, 30.0, 7800.0)
    theirs = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=40, num_spectrogram_bins=257, sample_rate=16000,
        lower_edge_hertz=30.0, upper_edge_hertz=7800.0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_gabor_params_within_constraint():
    ksize = 401
    params = gabor_params_from_mels(80, 16000, 30.0, 7800.0)
    clipped = np.asarray(gabor_constraint(jnp.asarray(params), ksize))
    # centers are never clipped; the narrowest (1-bin) low filters exceed
    # sigma_upper and get clipped — same as the reference's call-time
    # constraint (convolution.py:128-152)
    np.testing.assert_allclose(params[:, 0], clipped[:, 0], rtol=1e-6)
    sigma_upper = ksize * np.sqrt(2 * np.log(2)) / np.pi
    assert np.all(clipped[:, 1] <= sigma_upper + 1e-3)
    assert np.all(params[:, 0] >= 0) and np.all(params[:, 0] <= np.pi)
    # centers monotonically increasing (mel-ordered filters)
    assert np.all(np.diff(params[:, 0]) >= 0)


def test_gabor_filters_shape_and_energy():
    params = jnp.asarray(gabor_params_from_mels(8, 16000, 30.0, 7800.0))
    real, imag = gabor_filters_realimag(params, 401)
    assert real.shape == (8, 401) and imag.shape == (8, 401)
    assert np.isfinite(np.asarray(real)).all()
    # odd-symmetric imag at center, peak of gaussian at center
    np.testing.assert_allclose(np.asarray(imag)[:, 200], 0.0, atol=1e-6)


def test_gaussian_lowpass_kernel():
    k = np.asarray(gaussian_lowpass_kernel(jnp.full((4,), 0.4), 401))
    assert k.shape == (401, 4)
    assert np.argmax(k[:, 0]) == 200
    np.testing.assert_allclose(k[200], 1.0, atol=1e-6)


def test_pcen_ema_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.uniform(0.1, 2.0, (2, 20, 4)).astype(np.float32)
    model = PCEN(4)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(model.apply(variables, jnp.asarray(x)))

    p = variables["params"]
    alpha = np.minimum(np.asarray(p["alpha"]), 1.0)
    delta = np.asarray(p["delta"])
    root = np.maximum(np.asarray(p["root"]), 1.0)
    w = np.clip(np.asarray(p["smooth"]), 0.0, 1.0)
    ema = np.zeros_like(x)
    state = x[:, 0, :]
    for t in range(x.shape[1]):
        state = w * x[:, t, :] + (1.0 - w) * state
        ema[:, t, :] = state
    want = ((x / (1e-12 + ema) ** alpha + delta) ** (1.0 / root)
            - delta ** (1.0 / root))
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_leaf_shapes_and_grad():
    model = Leaf(n_filters=16, sample_rate=16000)
    wav = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 3200)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), wav)
    out = model.apply(variables, wav)
    assert out.shape == (2, 20, 16)          # ceil(3200/160) frames
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        return jnp.sum(model.apply({"params": params}, wav) ** 2)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the learnable pieces actually receive gradient
    g = grads["gabor_params"]
    assert float(jnp.abs(g).sum()) > 0
    assert float(jnp.abs(grads["pool_sigma"]).sum()) > 0


def test_leaf_in_conformer_encoder():
    """mel_layer_type='leaf' end-to-end through ConformerEncoder."""
    from tensorflowasr_tpu.models.conformer import (
        ConformerConfig, ConformerEncoder)

    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                          kernel_size=8, n_mels=16, mel_layer_type="leaf")
    enc = ConformerEncoder(cfg)
    wav = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 16000)).astype(np.float32) * 0.1)
    variables = enc.init(jax.random.PRNGKey(0), wav)
    out = enc.apply(variables, wav)
    assert out.shape == (1, 25, 32)
    assert np.isfinite(np.asarray(out)).all()
