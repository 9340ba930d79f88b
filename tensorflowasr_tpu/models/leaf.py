"""LEAF learnable audio frontend — JAX/flax re-design.

Re-implements the vendored google-research/leaf-audio frontend used by the
reference when ``mel_layer_type: leaf`` (leaf_audio/frontend.py:75-194,
selected at asr/models/conformer_blocks.py:315-317 in Z-yq/TensorflowASR):

    wav -> preemphasis Conv1D(k=2, [-alpha, 1])
        -> complex Gabor conv (2n channels, parametrized by (center, fwhm)
           per filter — leaf_audio/convolution.py:128-201, filters generated
           from params every call, constraint-clipped)
        -> squared modulus (re^2 + im^2 — frontend.py:49-72)
        -> Gaussian lowpass depthwise pooling, stride = hop
           (pooling.py:99-144, impulse_responses.py:105-125)
        -> floor 1e-5
        -> PCEN (per-channel energy normalization with learnable EMA —
           postprocessing.py:25-147); EMA is a sequential scan ->
           ``jax.lax.scan`` over time
        -> instance norm over time per channel (tfa InstanceNormalization)

Gabor params are initialized from an HTK mel filterbank
(initializers.GaborInit + melfilters.Gabor, initializers.py:52-87,
melfilters.py:30-107): center = argmax bin of sqrt(mel filter) in rad/sample,
fwhm param = sqrt(2 ln2) * n_fft / (pi * full-width-at-half-max bins).

All filters are regenerated from the 2n parameters inside the jitted step
(cheap: [n,2] -> [n, 401] elementwise) so the whole frontend is
differentiable and fuses into the training graph.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# Host-side initialization: Gabor params from mel filters
# ---------------------------------------------------------------------------

from tensorflowasr_tpu.ops.frontend import (  # noqa: E402
    _hz_to_mel_htk,
    _mel_to_hz_htk,
)


def linear_to_mel_weight_matrix(num_mel_bins: int, num_spectrogram_bins: int,
                                sample_rate: int, lower_edge_hertz: float,
                                upper_edge_hertz: float) -> np.ndarray:
    """HTK mel filterbank with triangles computed in MEL domain, DC bin
    zeroed — semantics of ``tf.signal.linear_to_mel_weight_matrix``.
    Returns [num_spectrogram_bins, num_mel_bins]."""
    nyquist = sample_rate / 2.0
    lin_freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)
    spec_mels = _hz_to_mel_htk(lin_freqs[1:])          # DC bin excluded
    band_edges = np.linspace(_hz_to_mel_htk(lower_edge_hertz),
                             _hz_to_mel_htk(upper_edge_hertz),
                             num_mel_bins + 2)
    lower, center, upper = (band_edges[:-2][None, :],
                            band_edges[1:-1][None, :],
                            band_edges[2:][None, :])
    s = spec_mels[:, None]
    low_slope = (s - lower) / (center - lower)
    up_slope = (upper - s) / (upper - center)
    w = np.maximum(0.0, np.minimum(low_slope, up_slope))
    return np.concatenate(
        [np.zeros((1, num_mel_bins)), w], axis=0).astype(np.float32)


def gabor_params_from_mels(n_filters: int, sample_rate: int,
                           min_freq: float, max_freq: float,
                           n_fft: int = 512) -> np.ndarray:
    """[n_filters, 2] (center rad/sample, fwhm param) matching
    melfilters.Gabor.gabor_params_from_mels (melfilters.py:62-75)."""
    mel = linear_to_mel_weight_matrix(
        n_filters, n_fft // 2 + 1, sample_rate, min_freq, max_freq).T
    sqrt_filters = np.sqrt(mel)                         # [n, n_freq]
    center_bins = np.argmax(sqrt_filters, axis=1).astype(np.float64)
    peaks = sqrt_filters.max(axis=1, keepdims=True)
    half = peaks / 2.0
    fwhms = (sqrt_filters >= half).sum(axis=1).astype(np.float64)
    coeff = math.sqrt(2.0 * math.log(2.0)) * n_fft
    params = np.stack([center_bins * 2.0 * np.pi / n_fft,
                       coeff / (np.pi * fwhms)], axis=1)
    return params.astype(np.float32)


# ---------------------------------------------------------------------------
# Device-side filter generation
# ---------------------------------------------------------------------------

def gabor_constraint(params: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Clip (mu, sigma) — convolution.GaborConstraint (:128-152)."""
    mu = jnp.clip(params[:, 0], 0.0, math.pi)
    sigma_lower = 4.0 * math.sqrt(2.0 * math.log(2.0)) / math.pi
    sigma_upper = kernel_size * math.sqrt(2.0 * math.log(2.0)) / math.pi
    sigma = jnp.clip(params[:, 1], sigma_lower, sigma_upper)
    return jnp.stack([mu, sigma], axis=1)


def gabor_filters_realimag(params: jnp.ndarray, size: int):
    """(real [n, size], imag [n, size]) Gabor impulse responses
    (impulse_responses.py:26-52), computed with real arithmetic."""
    t = jnp.arange(-(size // 2), (size + 1) // 2, dtype=jnp.float32)
    center, fwhm = params[:, 0:1], params[:, 1:2]       # [n, 1]
    denom = 1.0 / (jnp.sqrt(2.0 * math.pi) * fwhm)
    gauss = jnp.exp(-(t[None, :] ** 2) / (2.0 * fwhm ** 2))
    phase = center * t[None, :]
    real = denom * gauss * jnp.cos(phase)
    imag = denom * gauss * jnp.sin(phase)
    return real, imag


def gaussian_lowpass_kernel(sigma: jnp.ndarray, size: int) -> jnp.ndarray:
    """[C] sigma -> [size, C] zero-centered gaussian windows
    (impulse_responses.py:105-125)."""
    sigma = jnp.clip(sigma, 2.0 / size, 0.5)
    t = jnp.arange(size, dtype=jnp.float32)[:, None]
    numerator = t - 0.5 * (size - 1)
    denominator = sigma[None, :] * 0.5 * (size - 1)
    return jnp.exp(-0.5 * (numerator / denominator) ** 2)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class PCEN(nn.Module):
    """Per-channel energy normalization with learnable EMA
    (postprocessing.py:63-147): out = (x / (floor + EMA(x))^alpha + delta)
    ^(1/root) - delta^(1/root)."""

    n_channels: int
    alpha: float = 0.96
    smooth_coef: float = 0.04
    delta: float = 2.0
    root: float = 2.0
    floor: float = 1e-12
    per_channel_smooth_coef: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.n_channels
        alpha = self.param("alpha", nn.initializers.constant(self.alpha),
                           (c,))
        delta = self.param("delta", nn.initializers.constant(self.delta),
                           (c,))
        root = self.param("root", nn.initializers.constant(self.root), (c,))
        w_shape = (c,) if self.per_channel_smooth_coef else (1,)
        smooth = self.param("smooth",
                            nn.initializers.constant(self.smooth_coef),
                            w_shape)

        alpha = jnp.minimum(alpha, 1.0)
        root = jnp.maximum(root, 1.0)
        w = jnp.clip(smooth, 0.0, 1.0)

        # EMA over time via scan; initial state = first frame
        # (postprocessing.py:52-61, frontend call :141)
        def ema_step(state, xt):
            new = w * xt + (1.0 - w) * state
            return new, new

        x_tm = jnp.swapaxes(x, 0, 1)                    # [T, B, C]
        _, ema = jax.lax.scan(ema_step, x[:, 0, :], x_tm)
        ema = jnp.swapaxes(ema, 0, 1)                   # [B, T, C]

        one_over_root = 1.0 / root
        return ((x / (self.floor + ema) ** alpha + delta) ** one_over_root
                - delta ** one_over_root)


class Leaf(nn.Module):
    """LEAF frontend: wav [B, T(,1)] -> features [B, ceil(T/hop), n_filters].

    Mirrors frontend.Leaf defaults as instantiated by the reference encoder
    (conformer_blocks.py:315-317): preemp on, Gabor conv, squared modulus,
    Gaussian lowpass, PCEN(trainable, learnable per-channel smooth), mean/var
    instance norm; min/max freq 30 .. 3900*(sr/8000).
    """

    n_filters: int = 80
    sample_rate: int = 16000
    window_len_ms: float = 25.0
    window_stride_ms: float = 10.0
    min_freq: Optional[float] = None
    max_freq: Optional[float] = None
    preemp: bool = True
    preemp_alpha: float = 0.97
    mean_var_norm: bool = True
    use_pcen: bool = True
    dtype: Any = jnp.float32

    @property
    def kernel_size(self) -> int:
        return int(self.sample_rate * self.window_len_ms // 1000 + 1)

    @property
    def stride(self) -> int:
        return int(self.sample_rate * self.window_stride_ms // 1000)

    @nn.compact
    def __call__(self, wav: jnp.ndarray, training: bool = False
                 ) -> jnp.ndarray:
        if wav.ndim == 2:
            wav = wav[:, :, None]                        # [B, T, 1]
        wav = wav.astype(jnp.float32)
        # reference scaling (conformer_blocks.py:316-317): both edges scale
        # with integer sr // 8000 (60 .. 7800 Hz at 16 kHz)
        min_freq = (30.0 * (self.sample_rate // 8000)
                    if self.min_freq is None else self.min_freq)
        max_freq = (3900.0 * (self.sample_rate // 8000)
                    if self.max_freq is None else self.max_freq)
        ksize = self.kernel_size

        if self.preemp:
            # Conv1D(k=2) kernel [[-alpha], [1]] (initializers.PreempInit)
            preemp_kernel = self.param(
                "preemp_kernel",
                lambda key: jnp.asarray([[[-self.preemp_alpha]], [[1.0]]],
                                        jnp.float32))
            wav = jax.lax.conv_general_dilated(
                wav, preemp_kernel, window_strides=(1,), padding="SAME",
                dimension_numbers=("NHC", "HIO", "NHC"))

        # complex Gabor conv: params [n, 2] -> filters regenerated per call
        gabor_params = self.param(
            "gabor_params",
            lambda key: jnp.asarray(gabor_params_from_mels(
                self.n_filters, self.sample_rate, min_freq, max_freq)))
        params = gabor_constraint(gabor_params, ksize)
        real, imag = gabor_filters_realimag(params, ksize)
        # interleave: even channels real, odd imag (initializers.py:77-86)
        filt = jnp.stack([real, imag], axis=1).reshape(
            2 * self.n_filters, ksize)
        filt = jnp.transpose(filt)[:, None, :]           # [ksize, 1, 2n]
        y = jax.lax.conv_general_dilated(
            wav, filt.astype(self.dtype), window_strides=(1,),
            padding="SAME", dimension_numbers=("NHC", "HIO", "NHC"),
            preferred_element_type=jnp.float32)          # [B, T, 2n]

        # squared modulus: re^2 + im^2 over (even, odd) pairs
        b, t, _ = y.shape
        y = y.reshape(b, t, self.n_filters, 2)
        y = jnp.sum(y * y, axis=-1)                      # [B, T, n]

        # Gaussian lowpass depthwise pooling, stride = hop
        pool_sigma = self.param(
            "pool_sigma", nn.initializers.constant(0.4), (self.n_filters,))
        pool = gaussian_lowpass_kernel(pool_sigma, ksize)  # [ksize, n]
        # depthwise conv: feature_group_count = n, kernel [ksize, 1, n]
        y = jax.lax.conv_general_dilated(
            y.astype(self.dtype), pool[:, None, :].astype(self.dtype),
            window_strides=(self.stride,), padding="SAME",
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=self.n_filters,
            preferred_element_type=jnp.float32)          # [B, T/hop, n]

        y = jnp.maximum(y, 1e-5)
        if self.use_pcen:
            y = PCEN(self.n_filters, name="pcen")(y)

        if self.mean_var_norm:
            # instance norm over time, learnable scale/bias per channel
            # (tfa InstanceNormalization(axis=2), frontend.py:155-163)
            gamma = self.param("norm_scale", nn.initializers.ones,
                               (self.n_filters,))
            beta = self.param("norm_bias", nn.initializers.zeros,
                              (self.n_filters,))
            mean = jnp.mean(y, axis=1, keepdims=True)
            var = jnp.var(y, axis=1, keepdims=True)
            y = (y - mean) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
        return y
