"""Golden tests for the log-mel frontend against independent numpy/scipy
references (the reference repo's kernel semantics, re-derived from scratch)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tensorflowasr_tpu.ops import frontend as fe


def _np_stft_power(wav, n_fft, hop, padding):
    """Independent numpy framed-DFT power spectrogram."""
    t = len(wav)
    if padding == "same":
        out = -(-t // hop)
        pad = max((out - 1) * hop + n_fft - t, 0)
        lo, hi = pad // 2, pad - pad // 2
    else:
        lo, hi = n_fft - 1, 0
    x = np.pad(wav, (lo, hi))
    n_frames = (len(x) - n_fft) // hop + 1
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    frames = np.stack([x[i * hop: i * hop + n_fft] * win
                       for i in range(n_frames)])
    spec = np.fft.rfft(frames, n=n_fft, axis=-1)
    return (spec.real ** 2 + spec.imag ** 2).astype(np.float32)


@pytest.mark.parametrize("padding", ["same", "valid"])
def test_power_spectrogram_matches_numpy_fft(rng, padding):
    cfg = fe.LogMelFrontendConfig(n_fft=256, stride_ms=10,
                                  sample_rate=8000, padding=padding)
    wav = rng.standard_normal(4000).astype(np.float32)
    got = np.asarray(fe.power_spectrogram(jnp.asarray(wav[None]), cfg))[0]
    want = _np_stft_power(wav, cfg.n_fft, cfg.hop, padding)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_same_padding_frame_count():
    cfg = fe.LogMelFrontendConfig()
    for t in [16000, 16001, 15999, 112000]:
        wav = jnp.zeros((1, t))
        frames = fe.frame_signal(wav, cfg.n_fft, cfg.hop, "same")
        assert frames.shape[1] == -(-t // cfg.hop)


def test_valid_padding_is_causal():
    """Frame i of a 'valid' spectrogram depends only on samples <= i*hop."""
    cfg = fe.LogMelFrontendConfig(padding="valid")
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(3200).astype(np.float32)
    full = np.asarray(fe.power_spectrogram(jnp.asarray(wav[None]), cfg))[0]
    # perturb the future: frames strictly before the change must not move
    wav2 = wav.copy()
    wav2[1600:] += 1.0
    part = np.asarray(fe.power_spectrogram(jnp.asarray(wav2[None]), cfg))[0]
    # frame i covers samples (i*hop - n_fft +1) .. i*hop -> unaffected while
    # i*hop < 1600
    n_safe = 1600 // cfg.hop  # frames 0..9 end at sample <= 1440 < 1600
    np.testing.assert_allclose(part[:n_safe], full[:n_safe], rtol=1e-4,
                               atol=1e-4)


def test_mel_filterbank_properties():
    fb = fe.mel_filterbank(16000, 1024, 80)
    assert fb.shape == (513, 80)
    assert (fb >= 0).all()
    # every filter has some support; triangles overlap neighbors only
    assert (fb.sum(axis=0) > 0).all()
    # Slaney normalization: peak of each filter roughly 2/bandwidth -> small
    assert fb.max() < 0.1


def test_mel_filterbank_matches_independent_triangle_eval():
    """Cross-check against a from-first-principles scalar implementation of
    the Slaney mel triangles (different code path: per-bin triangle eval
    instead of the vectorized ramps construction)."""
    sr, n_fft, n_mels = 16000, 1024, 80
    fb = fe.mel_filterbank(sr, n_fft, n_mels).T  # [n_mels, n_freq]

    def hz2mel(f):
        if f < 1000.0:
            return f / (200.0 / 3)
        return 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)

    def mel2hz(m):
        if m < 15.0:
            return m * (200.0 / 3)
        return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))

    mel_pts = np.linspace(hz2mel(0.0), hz2mel(sr / 2), n_mels + 2)
    hz_pts = np.array([mel2hz(m) for m in mel_pts])
    fftfreqs = np.linspace(0, sr / 2, n_fft // 2 + 1)

    rng = np.random.default_rng(7)
    for _ in range(200):
        m = int(rng.integers(0, n_mels))
        f = int(rng.integers(0, n_fft // 2 + 1))
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        x = fftfreqs[f]
        if x <= lo or x >= hi:
            tri = 0.0
        elif x <= ctr:
            tri = (x - lo) / (ctr - lo)
        else:
            tri = (hi - x) / (hi - ctr)
        tri *= 2.0 / (hi - lo)  # slaney area normalization
        assert fb[m, f] == pytest.approx(tri, rel=1e-4, abs=1e-9)


def test_log_mel_shapes_and_finite(rng):
    cfg = fe.LogMelFrontendConfig()
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    mel = np.asarray(fe.log_mel_spectrogram(jnp.asarray(wav), cfg))
    assert mel.shape == (2, 100, 80)
    assert np.isfinite(mel).all()
    # dB-before-mel parity: values are mel-weighted decibels -> <= 0 always
    assert (mel <= 1e-3).all()


def test_db_normalization_per_sample(rng):
    cfg = fe.LogMelFrontendConfig()
    wav = rng.standard_normal((2, 16000)).astype(np.float32)
    # scaling one sample must not change its features (per-sample max norm)
    mel1 = np.asarray(fe.log_mel_spectrogram(jnp.asarray(wav), cfg))
    wav2 = wav.copy()
    wav2[0] *= 7.3
    mel2 = np.asarray(fe.log_mel_spectrogram(jnp.asarray(wav2), cfg))
    np.testing.assert_allclose(mel1, mel2, rtol=1e-3, atol=1e-3)
