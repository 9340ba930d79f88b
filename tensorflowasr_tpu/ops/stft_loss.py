"""Multi-resolution STFT loss (Parallel-WaveGAN style).

Re-designs the reference's TF loss (vad/utils/stft.py:127-213 in
Z-yq/TensorflowASR) in JAX: per resolution,

  sc_loss  = ||  |Y| - |X|  ||_F / || |Y| ||_F      (spectral convergence)
  mag_loss = mean | log|Y| - log|X| |                (log-magnitude L1)

summed over resolutions (1024/600/120) and (512/250/50) and averaged.
STFT semantics match ``tf.signal.stft``: periodic Hann of ``frame_length``,
no centering, pad_end=False, window zero-padded to ``fft_length`` —
implemented as hop-strided framing + rfft (XLA lowers FFT natively on TPU).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.ops.frontend import hann_window


def stft_magnitude(x: jnp.ndarray, frame_length: int, frame_step: int,
                   fft_length: int) -> jnp.ndarray:
    """[B, T] -> [B, n_frames, fft_length//2+1] magnitudes
    (tf.signal.stft semantics: no centering, pad_end=False)."""
    b, t = x.shape
    n_frames = 1 + (t - frame_length) // frame_step
    frames = jax.lax.conv_general_dilated_patches(
        x[:, :, None], filter_shape=(frame_length,),
        window_strides=(frame_step,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"))[:, :n_frames]
    win = jnp.asarray(hann_window(frame_length))
    frames = frames * win[None, None, :]
    if fft_length > frame_length:
        frames = jnp.pad(frames, ((0, 0), (0, 0),
                                  (0, fft_length - frame_length)))
    return jnp.abs(jnp.fft.rfft(frames, n=fft_length, axis=-1))


def _single_res_loss(y: jnp.ndarray, x: jnp.ndarray, frame_length: int,
                     frame_step: int, fft_length: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x_mag = stft_magnitude(x, frame_length, frame_step, fft_length)
    y_mag = stft_magnitude(y, frame_length, frame_step, fft_length)
    # numeric floor, compatible with the reference (stft.py:159-161)
    x_mag = jnp.sqrt(x_mag ** 2 + 1e-7) + 1e-6
    y_mag = jnp.sqrt(y_mag ** 2 + 1e-7) + 1e-6
    # norms via an eps-guarded sqrt: jnp.linalg.norm's gradient is
    # diff/norm, which is 0/0 = NaN when prediction == target exactly —
    # hit in practice by all-silence streaming windows (both spectra
    # collapse to the identical floor constant). sqrt(sum + eps) keeps
    # the value (within eps) and makes the zero-diff gradient 0.
    def _norm(a):
        return jnp.sqrt(jnp.sum(a ** 2, axis=(1, 2)) + 1e-24)

    sc = _norm(y_mag - x_mag) / (_norm(y_mag) + 1e-12)
    mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)), axis=(1, 2))
    return jnp.mean(sc), jnp.mean(mag)


@functools.partial(jax.jit, static_argnames=("fft_lengths", "frame_lengths",
                                             "frame_steps"))
def multi_resolution_stft_loss(
        y: jnp.ndarray, x: jnp.ndarray,
        fft_lengths: Sequence[int] = (1024, 512),
        frame_lengths: Sequence[int] = (600, 250),
        frame_steps: Sequence[int] = (120, 50)) -> jnp.ndarray:
    """Scalar loss over ground truth ``y`` and prediction ``x``, both
    [B, T] (or any [B, ...] flattened to [B, T])."""
    y = y.reshape(y.shape[0], -1).astype(jnp.float32)
    x = x.reshape(x.shape[0], -1).astype(jnp.float32)
    sc_total, mag_total = 0.0, 0.0
    for fl, fs, nfft in zip(frame_lengths, frame_steps, fft_lengths):
        sc, mag = _single_res_loss(y, x, fl, fs, nfft)
        sc_total += sc
        mag_total += mag
    n = len(fft_lengths)
    return sc_total / n + mag_total / n
