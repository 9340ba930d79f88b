"""Raw-waveform auxiliary encoder (WavePickModel).

Re-designs the reference wav_model.py:58-147 in Z-yq/TensorflowASR: a
strided conv pyramid that downsamples raw audio by the total hop size
(hop * reduction_factor, factorized into <= 4 strides) so its output
aligns frame-for-frame with the conv-subsampled mel features, to which it
is ADDED when ``add_wav_info`` is on (conformer_blocks.py:325-348).

Stack: SeparableConv1D(32, k=7, s=s0) -> LeakyReLU ->
       [Conv1D(min(32*(i+1), dout), k=3, s=si) -> ResidualStack]* ->
       Conv1D(dout, k=7)
ResidualStack = LeakyReLU -> reflect-pad -> Conv1D(k=5, dilated) ->
       LeakyReLU -> Conv1D(k=1), plus a Conv1D(k=1) shortcut.
"""

from __future__ import annotations

from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from tensorflowasr_tpu.models.layers import keras_kernel_init


def get_scales(num: int) -> List[int]:
    """Factorize ``num`` into <= 4 stride factors, largest first
    (wav_model.py:132-147)."""
    scale: List[int] = []
    while True:
        for i in range(2, 100):
            if num % i == 0:
                num //= i
                scale.append(i)
                break
        else:
            if num > 1:          # prime > 99 remainder
                scale.append(num)
                num = 1
        if num == 1:
            break
    while len(scale) > 4:
        new_scale = scale[2:]
        new_scale.append(scale[0] * scale[1])
        scale = sorted(new_scale)
    return scale[::-1]


class ResidualStack(nn.Module):
    filters: int
    kernel_size: int = 5
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.kernel_size - 1) // 2 * self.dilation
        y = nn.leaky_relu(x, negative_slope=0.3)
        y = jnp.pad(y, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        y = nn.Conv(self.filters, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="VALID",
                    dtype=self.dtype, kernel_init=keras_kernel_init(), name="conv")(y)
        y = nn.leaky_relu(y, negative_slope=0.3)
        y = nn.Conv(self.filters, (1,), dtype=self.dtype, kernel_init=keras_kernel_init(), name="pw")(y)
        shortcut = nn.Conv(self.filters, (1,), dtype=self.dtype,
                           kernel_init=keras_kernel_init(), name="shortcut")(x)
        return shortcut + y


class WavePickModel(nn.Module):
    """wav [B, T(,1)] -> [B, T / hop_size, dout]."""

    dout: int
    hop_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False
                 ) -> jnp.ndarray:
        if x.ndim == 2:
            x = x[:, :, None]
        x = x.astype(self.dtype)
        scales = get_scales(self.hop_size)
        # SeparableConv1D(32, k=7, s=scales[0]): depthwise then pointwise
        from tensorflowasr_tpu.models.layers import DepthwiseConv1D

        x = DepthwiseConv1D(x.shape[-1], 7, stride=scales[0],
                            padding="SAME", dtype=self.dtype,
                            name="sep_dw")(x)
        x = nn.Conv(32, (1,), dtype=self.dtype, kernel_init=keras_kernel_init(), name="sep_pw")(x)
        x = nn.leaky_relu(x, negative_slope=0.3)
        for i in range(1, len(scales)):
            f = min(32 * (i + 1), self.dout)
            x = nn.Conv(f, (3,), strides=(scales[i],), padding="SAME",
                        dtype=self.dtype, kernel_init=keras_kernel_init(), name=f"down_{i}")(x)
            x = ResidualStack(f, dtype=self.dtype, name=f"res_{i}")(x)
        return nn.Conv(self.dout, (7,), padding="SAME", dtype=self.dtype,
                       kernel_init=keras_kernel_init(), name="final")(x)
