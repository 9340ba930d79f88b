"""WavePickModel tests: stride factorization, frame alignment, and the
add_wav_info encoder path."""

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.models.wav_model import WavePickModel, get_scales


def test_get_scales_factorization():
    for num in (640, 160, 320, 960, 256):
        scales = get_scales(num)
        assert len(scales) <= 4
        assert np.prod(scales) == num
        assert scales == sorted(scales, reverse=True)


def test_wav_pick_output_alignment():
    hop = 640  # 16kHz, stride 10ms, rf 4
    model = WavePickModel(dout=32, hop_size=hop)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, hop * 25)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), wav)
    out = model.apply(variables, wav)
    assert out.shape == (2, 25, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_encoder_with_wav_info():
    from tensorflowasr_tpu.models.conformer import (
        ConformerConfig, ConformerEncoder)

    cfg = ConformerConfig(dmodel=32, num_blocks=1, head_size=8, num_heads=2,
                          kernel_size=8, add_wav_info=True, dropout=0.0)
    enc = ConformerEncoder(cfg)
    wav = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 16000)).astype(np.float32) * 0.1)
    variables = enc.init(jax.random.PRNGKey(0), wav)
    assert "wav_layer" in variables["params"]
    out = enc.apply(variables, wav)
    assert out.shape == (1, 25, 32)
    assert np.isfinite(np.asarray(out)).all()
