"""On-device SpecAugment — mel-domain time/frequency hole masking.

TPU-first replacement for the reference's HOST-side STFT hole masking
(augmentations/augments.py:9-26 ``SignalSpecAug``, scipy stft/istft per
sample on the CPU): here the masking runs INSIDE the jitted train step on
the log-mel output, so it costs zero host batch-prep time (the measured
training bottleneck) and a few fused element-wise ops on device.

Semantics follow Park et al. 2019 (SpecAugment): ``n`` frequency masks of
width ~ U[0, F] and ``n`` time masks of width ~ U[0, T_max], filled with
the utterance's mean log-mel value (a hole of "average energy", the
log-domain analogue of the reference's zeroed STFT bins). All shapes are
static; the masks are two broadcasted-iota compares and one select, so XLA
fuses them into the frontend's epilogue.

Enable with ``speech_config.spec_augment: true`` (plus the optional
``specaug_*`` knobs); applied only when ``training=True``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_masks(key_w, key_s, batch: int, n_masks: int, dim: int,
                max_width: int) -> jnp.ndarray:
    """[B, dim] bool — union of ``n_masks`` random bands per example.

    Each band: width ~ U{0..max_width}, start ~ U{0..dim-width} (always
    fully inside the axis).
    """
    max_width = max(0, min(int(max_width), dim))
    w = jax.random.randint(key_w, (batch, n_masks), 0, max_width + 1)
    u = jax.random.uniform(key_s, (batch, n_masks))
    s = jnp.floor(u * (dim - w + 1).astype(jnp.float32)).astype(jnp.int32)
    pos = jnp.arange(dim)[None, None, :]
    band = (pos >= s[..., None]) & (pos < (s + w)[..., None])   # [B, n, dim]
    return jnp.any(band, axis=1)


def spec_augment(mel: jnp.ndarray, rng: jax.Array,
                 n_freq_masks: int = 2, freq_width: int = 27,
                 n_time_masks: int = 2, time_ratio: float = 0.05
                 ) -> jnp.ndarray:
    """Mask random time/frequency bands of a log-mel batch [B, T, F].

    ``time_ratio`` scales the max time-mask width with the (static)
    sequence length so the same config works across duration buckets.
    """
    b, t, f = mel.shape
    kfw, kfs, ktw, kts = jax.random.split(rng, 4)
    masked = jnp.zeros((b, t, f), bool)
    if n_freq_masks > 0 and freq_width > 0:
        fm = _axis_masks(kfw, kfs, b, n_freq_masks, f, freq_width)
        masked = masked | fm[:, None, :]
    time_width = int(round(t * float(time_ratio)))
    if n_time_masks > 0 and time_width > 0:
        tm = _axis_masks(ktw, kts, b, n_time_masks, t, time_width)
        masked = masked | tm[:, :, None]
    fill = jax.lax.stop_gradient(jnp.mean(mel, axis=(1, 2), keepdims=True))
    return jnp.where(masked, fill.astype(mel.dtype), mel)
