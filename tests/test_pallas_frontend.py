"""Pallas fused frontend kernel vs the XLA reference path (interpret mode
on the CPU test mesh; the same kernel compiles with Mosaic on TPU)."""

import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.ops import frontend as fe
from tensorflowasr_tpu.ops.pallas_frontend import (
    log_mel_spectrogram_pallas,
    power_spectrogram_pallas,
)


def _wav(b=2, t=16000, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(
        (b, t)).astype(np.float32) * 0.1)


def test_power_spectrogram_matches_xla_same():
    cfg = fe.LogMelFrontendConfig(padding="same")
    wav = _wav()
    want = np.asarray(fe.power_spectrogram(wav, cfg))
    got = np.asarray(power_spectrogram_pallas(wav, cfg, interpret=True,
                                              tile_f=32))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_power_spectrogram_matches_xla_valid():
    cfg = fe.LogMelFrontendConfig(padding="valid")
    wav = _wav(t=2560 * 3, seed=1)
    want = np.asarray(fe.power_spectrogram(wav, cfg))
    got = np.asarray(power_spectrogram_pallas(wav, cfg, interpret=True,
                                              tile_f=16))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_log_mel_matches_xla():
    cfg = fe.LogMelFrontendConfig(padding="same")
    wav = _wav(seed=2)
    want = np.asarray(fe.log_mel_spectrogram(wav, cfg))
    got = np.asarray(log_mel_spectrogram_pallas(wav, cfg, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-2)
