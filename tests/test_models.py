"""Shape, parameter-count, and behavior tests for the Conformer family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tensorflowasr_tpu.models.conformer import (
    ConformerCTC,
    ConformerConfig,
    ConformerEncoder,
    StreamingConformerEncoder,
    count_params,
)

SMALL = ConformerConfig(dmodel=32, num_blocks=2, head_size=8, num_heads=2,
                        kernel_size=8, dropout=0.0,
                        ctcdecoder_num_blocks=1, translator_num_blocks=1,
                        ctcdecoder_dropout=0.0, translator_dropout=0.0)


def test_encoder_output_shape(rng):
    enc = ConformerEncoder(SMALL)
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), wav)
    out = enc.apply(params, wav)
    # 16000 samples -> 100 mel frames -> /4 = 25 encoder frames
    assert out.shape == (2, 25, SMALL.dmodel)
    assert np.isfinite(np.asarray(out)).all()


def test_streaming_encoder_matches_offline_math(rng):
    """Block streaming = offline encoder run per chunk: outputs for a
    2-chunk input must equal concatenating two 1-chunk runs."""
    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                          kernel_size=8, dropout=0.0, streaming=True,
                          streaming_bucket=0.5)
    enc = StreamingConformerEncoder(cfg)
    chunk = cfg.chunk_samples
    wav = jnp.asarray(rng.standard_normal((1, 2 * chunk)).astype(np.float32))
    params = enc.init(jax.random.PRNGKey(0), wav)
    full = enc.apply(params, wav)
    a = enc.apply(params, wav[:, :chunk])
    b = enc.apply(params, wav[:, chunk:])
    got = np.asarray(full)
    want = np.concatenate([np.asarray(a), np.asarray(b)], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_full_model_shapes(rng):
    model = ConformerCTC(SMALL, num_phone_classes=50, num_char_classes=100)
    wav = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    phones = jnp.ones((2, 12), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), wav, phones)
    enc, ctc, char = model.apply(variables, wav, phones)
    assert enc.shape == (2, 13, SMALL.dmodel)   # ceil(50/4)
    assert ctc.shape == (2, 13, 50)
    assert char.shape == (2, 12, 100)


def test_conformer_s_param_count():
    """ConformerCTC(S) must land near the published ~10M params
    (BASELINE.md: 10 M / README table 10.1 M) with the real vocab sizes."""
    cfg = ConformerConfig()  # conformerS.yml defaults
    model = ConformerCTC(cfg, num_phone_classes=231, num_char_classes=9161)
    wav = jnp.zeros((1, 16000), jnp.float32)
    phones = jnp.zeros((1, 8), jnp.int32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), wav, phones))
    n = count_params(variables["params"])
    assert 8_000_000 < n < 13_000_000, f"param count {n:,}"


def test_trainable_mel_filterbank():
    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                          mel_layer_trainable=True, dropout=0.0)
    enc = ConformerEncoder(cfg)
    wav = jnp.zeros((1, 8000), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), wav)
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    assert any("freq2mel" in n for n in names)


def test_dropout_requires_rng_in_training(rng):
    model = ConformerCTC(SMALL, num_phone_classes=50, num_char_classes=100)
    wav = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
    phones = jnp.ones((1, 6), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), wav, phones)
    cfg_do = ConformerConfig(dmodel=32, num_blocks=2, head_size=8,
                             num_heads=2, kernel_size=8, dropout=0.5,
                             ctcdecoder_num_blocks=1, translator_num_blocks=1)
    model_do = ConformerCTC(cfg_do, num_phone_classes=50,
                            num_char_classes=100)
    variables = model_do.init(jax.random.PRNGKey(0), wav, phones)
    out1 = model_do.apply(variables, wav, phones, training=True,
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"])[0]
    out2 = model_do.apply(variables, wav, phones, training=True,
                          rngs={"dropout": jax.random.PRNGKey(2)},
                          mutable=["batch_stats"])[0]
    # different dropout keys -> different outputs
    assert not np.allclose(np.asarray(out1[1]), np.asarray(out2[1]))


def test_batchnorm_stats_update(rng):
    model = ConformerCTC(SMALL, num_phone_classes=50, num_char_classes=100)
    wav = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
    phones = jnp.ones((1, 6), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), wav, phones)
    assert "batch_stats" in variables
    _, new_state = model.apply(variables, wav, phones, training=True,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               mutable=["batch_stats"])
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(new_state["batch_stats"])
    assert any(not np.allclose(np.asarray(o), np.asarray(n))
               for o, n in zip(old, new))
