"""Conformer building blocks as flax.linen modules.

Architectural parity with the reference blocks
(asr/models/conformer_blocks.py:10-274 in Z-yq/TensorflowASR):

- GLU                 (:10-26)   split-in-2 gated linear unit
- ConvSubsampling     (:67-104)  2x strided Conv2D -> merge freq x chan -> Dense
- FFModule            (:107-146) LN -> Dense(4d) -> swish -> Dense(d), half residual
- MHSAModule          (:149-179) LN -> MHA -> residual (NO positional encoding
                                 in encoder self-attention — parity with the
                                 commented-out pc at :157,165)
- ConvModule          (:182-232) LN -> pw(2d) -> GLU -> depthwise-separable
                                 conv -> BN -> swish -> pw(d) -> residual
- ConformerBlock      (:235-274) FF/2 -> MHSA -> Conv -> FF/2 -> LN
- PositionalEncoding  (layers/positional_encoding.py:19-53) interleaved sin/cos
- RMHSAModule/RBlock  (:440-510) PE + cross-attention block for the Translator

Norm parity: every reference conformer norm is a stock Keras layer —
LayerNormalization(epsilon=1e-3) / BatchNormalization(epsilon=1e-3,
momentum=0.99) — while flax defaults to 1e-6/1e-5; all LN/BN here pass
epsilon=1e-3 explicitly (round-5 bisect item; the punc model keeps 1e-6
because the reference punc_transformer.py:142-173 sets it explicitly).

TPU notes: all matmuls run in ``dtype`` (bfloat16 by default in training)
with float32 params and float32 layer/batch norms; convs are expressed as
``lax.conv_general_dilated`` through flax Conv so XLA can fuse and tile them
onto the MXU. Everything is static-shape.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=axis)
    return a * nn.sigmoid(b)


def keras_kernel_init():
    """Keras ``Dense``/``Conv1D``/``Conv2D`` default kernel init:
    glorot_uniform. flax defaults to ``lecun_normal`` — a sqrt(2·fan_in/
    (fan_in+fan_out)) scale gap plus a distribution-shape gap that
    measurably changes early training dynamics vs the reference (the
    embedding-only fix in round 4 proved this class of mismatch costs
    CER; round 5 completes the pass). For 1-D/2-D conv kernels flax and
    Keras compute identical fans from the (k..., in, out) layout, so the
    stock initializer is exact parity."""
    return nn.initializers.glorot_uniform()


def keras_depthwise_init():
    """glorot_uniform with Keras's ``DepthwiseConv1D``/``SeparableConv1D``
    fan convention. Keras stores the depthwise kernel as
    (k, channels, depth_multiplier=1) ⇒ fan_in = k·C, fan_out = k·1;
    our layout is (k, 1, C), for which flax's generic fan rule would give
    fan_in = k, fan_out = k·C — a very different limit. This init applies
    the Keras fans to our layout."""
    def init(key, shape, dtype=jnp.float32):
        k, dm, c = shape
        limit = float(np.sqrt(6.0 / (k * c + k * dm)))
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


def keras_mha_qkv_init(num_heads: int, head_size: int):
    """glorot_uniform with the reference MHA's fan convention for the
    q/k/v kernels. The reference stores them as
    [num_heads, d_in, head_size] (asr/models/layers/multihead_attention.py:
    75-98), so Keras computes fan_in = h·d_in, fan_out = h·head_size.
    flax's DenseGeneral hands this init the flattened (d_in, h·hd) shape;
    we recompute the reference limit from the closed-over h/hd."""
    def init(key, shape, dtype=jnp.float32):
        d_in = shape[0]
        limit = float(np.sqrt(
            6.0 / (num_heads * d_in + num_heads * head_size)))
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


def keras_mha_out_init(num_heads: int):
    """Reference MHA projection kernel [num_heads, head_size, out]:
    fan_in = h·hd, fan_out = h·out. flax hands the flattened
    (h·hd, out) shape, so fan_in is shape[0] as-is and fan_out is
    h·shape[1]."""
    def init(key, shape, dtype=jnp.float32):
        limit = float(np.sqrt(6.0 / (shape[0] + num_heads * shape[1])))
        return jax.random.uniform(key, shape, dtype, -limit, limit)

    return init


def keras_embedding_init(scale: float = 0.05):
    """Keras ``Embedding`` default init: uniform(-0.05, 0.05). flax's
    ``nn.Embed`` defaults to normal(stddev=1) — a 20x input-scale gap
    that measurably slows the char/punc branches' convergence vs the
    reference on hard vocab-lookup tasks (round-4 head-to-head); every
    embedding matching a reference ``tf.keras.layers.Embedding`` uses
    this init."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def _dw_pad(t: int, k: int, stride: int, padding: str):
    if padding == "CAUSAL":
        return k - 1, 0
    if padding != "SAME":
        # the nn.Conv this replaced accepted VALID/explicit pads too —
        # refuse rather than silently produce SAME output shapes
        raise ValueError(
            f"DepthwiseConv1D supports padding 'SAME' or 'CAUSAL', "
            f"got {padding!r}")
    out_t = -(-t // stride)
    total = max((out_t - 1) * stride + k - t, 0)
    return total // 2, total - total // 2


def _dw_conv_value(x, kernel, lo, hi, stride=1):
    """Plain grouped-conv VALUE (the fast TPU lowering)."""
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=[(lo, hi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv1d(x, kernel, lo, hi):
    """Depthwise 1-D conv (stride 1), [B, T, C] x [K, 1, C] -> [B, T', C]
    with explicit (lo, hi) time padding.

    The forward is the ordinary grouped-conv primitive — identical speed
    to nn.Conv(feature_group_count=C). The custom VJP exists because
    XLA's built-in grouped-conv KERNEL-GRADIENT partitioner over-counts
    by the replica factor on partially replicated meshes (fine on a pure
    ``data`` mesh; a ("data", "model") tensor-parallel mesh returns
    kernel grads scaled by the model-axis size — regression test
    tests/test_tp.py::test_depthwise_grad_partial_replication). The
    backward here uses only partitioner-safe VALUE computations: dx is a
    conv of dy with the flipped kernel, dk a K-tap slice/reduce."""
    return _dw_conv_value(x, kernel, lo, hi)


def _dw_fwd(x, kernel, lo, hi):
    return _dw_conv_value(x, kernel, lo, hi), (x, kernel)


def _dw_bwd(lo, hi, res, dy):
    x, kernel = res
    k = kernel.shape[0]
    t = x.shape[1]
    # dxp[u] = sum_i dy[u - i] w[i]  ==  conv(dy, flip(w), pad K-1);
    # then slice the padded-input grad back to x's range
    dxp = _dw_conv_value(dy, jnp.flip(kernel, axis=0), k - 1, k - 1)
    dx = jax.lax.slice_in_dim(dxp, lo, lo + t, axis=1)
    # dk[i, 0, c] = sum_{b, u} xp[b, u + i, c] dy[b, u, c]
    xp = jnp.pad(x, ((0, 0), (lo, hi), (0, 0)))
    out_t = dy.shape[1]
    dk = jnp.stack([
        jnp.sum(jax.lax.slice_in_dim(xp, i, i + out_t, axis=1) * dy,
                axis=(0, 1))
        for i in range(k)])[:, None, :]
    return dx, dk.astype(kernel.dtype)


depthwise_conv1d.defvjp(_dw_fwd, _dw_bwd)


class DepthwiseConv1D(nn.Module):
    """Drop-in for ``nn.Conv(features=C, feature_group_count=C)``: same
    param names/shapes (``kernel`` [K, 1, C], ``bias`` [C] — native
    engines and checkpoints read these), same forward lowering, but
    GSPMD-safe gradients via ``depthwise_conv1d``'s custom VJP (see its
    docstring for the XLA partial-replication bug this works around).

    ``padding``: "SAME" or "CAUSAL" (pad (K-1, 0), the chunk variants'
    form). ``stride`` > 1 (frontend pooling use) takes the plain
    primitive — strided value+grad; only use it on fully batch-sharded
    or single-device meshes.
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: str = "SAME"
    dtype: jnp.dtype = jnp.float32
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad=None) -> jnp.ndarray:
        """``pad``: explicit (lo, hi) time padding overriding the
        ``padding`` policy — e.g. (0, 0) for a VALID window over a
        streaming ring that already holds the needed left context."""
        k, c = self.kernel_size, self.features
        kernel = self.param("kernel", keras_depthwise_init(),
                            (k, 1, c)).astype(self.dtype)
        x = x.astype(self.dtype)
        lo, hi = pad if pad is not None \
            else _dw_pad(x.shape[1], k, self.stride, self.padding)
        if self.stride == 1:
            y = depthwise_conv1d(x, kernel, lo, hi)
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(self.stride,),
                padding=[(lo, hi)],
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=c)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (c,)).astype(self.dtype)
        return y


class ConvSubsampling(nn.Module):
    """[B, T, F, 1] -> [B, ceil(T / reduction_factor), odim].

    Two 3x3 SAME convs with strides (rf/2, 2) and (2, 2), ReLU, then the
    freq x channel dims merge into a Dense projection.
    """

    odim: int
    reduction_factor: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        assert self.reduction_factor % 2 == 0
        x = x.astype(self.dtype)
        x = nn.Conv(self.odim, (3, 3),
                    strides=(self.reduction_factor // 2, 2),
                    padding="SAME", dtype=self.dtype,
                    kernel_init=keras_kernel_init(), name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="SAME",
                    dtype=self.dtype, kernel_init=keras_kernel_init(),
                    name="conv2")(x)
        x = nn.relu(x)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = nn.Dense(self.odim, dtype=self.dtype,
                     kernel_init=keras_kernel_init(), name="linear")(x)
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return x


class FFModule(nn.Module):
    input_dim: int
    dropout: float = 0.0
    fc_factor: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="ln")(x)
        y = nn.Dense(4 * self.input_dim, dtype=self.dtype,
                     kernel_init=keras_kernel_init(), name="ffn1")(y)
        y = nn.swish(y)
        y = nn.Dropout(self.dropout, deterministic=not training)(y)
        y = nn.Dense(self.input_dim, dtype=self.dtype,
                     kernel_init=keras_kernel_init(), name="ffn2")(y)
        y = nn.Dropout(self.dropout, deterministic=not training)(y)
        return x + self.fc_factor * y


class MHSAModule(nn.Module):
    head_size: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="ln")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.head_size * self.num_heads,
            out_features=x.shape[-1],
            dtype=self.dtype,
            kernel_init=keras_mha_qkv_init(self.num_heads, self.head_size),
            out_kernel_init=keras_mha_out_init(self.num_heads),
            name="mha",
        )(y, inputs_k=y, mask=mask)
        y = nn.Dropout(self.dropout, deterministic=not training)(y)
        return x + y


class ConvModule(nn.Module):
    input_dim: int
    kernel_size: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    padding: str = "SAME"  # 'SAME' offline, 'CAUSAL' for chunk variants

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        y = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="ln")(x)
        # pointwise Conv1D(2d, k=1) == Dense
        y = nn.Dense(2 * self.input_dim, dtype=self.dtype,
                     kernel_init=keras_kernel_init(), name="pw_conv_1")(y)
        y = glu(y)  # -> d channels
        # SeparableConv1D(2d, k): depthwise over d then pointwise d -> 2d
        y = DepthwiseConv1D(self.input_dim, self.kernel_size,
                            padding=self.padding, dtype=self.dtype,
                            name="dw_conv")(y)
        y = nn.Dense(2 * self.input_dim, dtype=self.dtype,
                     kernel_init=keras_kernel_init(), name="dw_pw")(y)
        y = nn.BatchNorm(use_running_average=not training,
                         epsilon=1e-3, dtype=jnp.float32, name="bn")(y)
        y = nn.swish(y)
        y = nn.Dense(self.input_dim, dtype=self.dtype,
                     kernel_init=keras_kernel_init(), name="pw_conv_2")(y)
        y = nn.Dropout(self.dropout, deterministic=not training)(y)
        return x + y


class ConformerBlock(nn.Module):
    input_dim: int
    dropout: float = 0.0
    fc_factor: float = 0.5
    head_size: int = 36
    num_heads: int = 4
    kernel_size: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = FFModule(self.input_dim, self.dropout, self.fc_factor,
                     dtype=self.dtype, name="ff_module_1")(x, training)
        x = MHSAModule(self.head_size, self.num_heads, self.dropout,
                       dtype=self.dtype, name="mhsa")(x, training, mask)
        x = ConvModule(self.input_dim, self.kernel_size, self.dropout,
                       dtype=self.dtype, name="conv_module")(x, training)
        x = FFModule(self.input_dim, self.dropout, self.fc_factor,
                     dtype=self.dtype, name="ff_module_2")(x, training)
        return nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="ln")(x)


class ScannedConformerBlocks(nn.Module):
    """N identical ConformerBlocks applied via ``nn.scan`` with stacked
    [N, ...] parameters — XLA traces ONE block instead of N, cutting
    compile time roughly N-fold for deep stacks. Numerics are identical
    to the unrolled loop (same math, different param layout).

    ``unroll``: lax.scan unroll factor. The scan BACKWARD pays a heavy
    per-iteration stacked-gradient accumulation on TPU (measured 70 ms vs
    39 ms fwd+bwd for 13 blocks at [128, 200, 144] bf16); unrolling the
    scan body recovers the unrolled-loop speed while KEEPING the stacked
    parameter layout and the one-block trace -> set ``scan_unroll:
    num_blocks`` for training, leave 1 for inference-only programs where
    compile time matters more."""

    num_blocks: int
    input_dim: int
    dropout: float = 0.0
    fc_factor: float = 0.5
    head_size: int = 36
    num_heads: int = 4
    kernel_size: int = 32
    dtype: jnp.dtype = jnp.float32
    unroll: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        # each block ends in a float32 LayerNorm, so the inter-block dtype
        # is f32 even under bf16 compute; the scan carry must match it
        x = x.astype(jnp.float32)
        scan = nn.scan(
            _ScanBody,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num_blocks,
            unroll=max(1, min(self.unroll, self.num_blocks)),
        )
        out, _ = scan(
            input_dim=self.input_dim, dropout=self.dropout,
            fc_factor=self.fc_factor, head_size=self.head_size,
            num_heads=self.num_heads, kernel_size=self.kernel_size,
            dtype=self.dtype, training=training, name="scan",
        )(x, None)
        return out


class _ScanBody(nn.Module):
    input_dim: int
    dropout: float
    fc_factor: float
    head_size: int
    num_heads: int
    kernel_size: int
    dtype: jnp.dtype
    training: bool

    @nn.compact
    def __call__(self, carry, _):
        out = ConformerBlock(
            input_dim=self.input_dim, dropout=self.dropout,
            fc_factor=self.fc_factor, head_size=self.head_size,
            num_heads=self.num_heads, kernel_size=self.kernel_size,
            dtype=self.dtype, name="block")(carry, self.training)
        return out, None


def positional_encoding(length: int, dmodel: int) -> np.ndarray:
    """Interleaved sin/cos PE table [length, dmodel]
    (parity: asr/models/layers/positional_encoding.py:19-53)."""
    pos = np.arange(length, dtype=np.float32)[:, None]
    idx = np.arange(dmodel, dtype=np.float32)[None, :]
    angle = pos / np.power(10000.0, (2.0 * (idx // 2)) / dmodel)
    pe = np.zeros((length, dmodel), dtype=np.float32)
    pe[:, 0::2] = np.sin(angle[:, 0::2])
    pe[:, 1::2] = np.cos(angle[:, 1::2])
    return pe


class PositionalEncoding(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        t, d = x.shape[1], x.shape[2]
        pe = jnp.asarray(positional_encoding(t, d), dtype=x.dtype)
        return x + pe[None]


class RMHSAModule(nn.Module):
    """Cross-attention module of the Translator: PE(x) -> LN -> MHA(q=x,
    kv=enc) -> residual (conformer_blocks.py:440-470)."""

    head_size: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, enc: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        y = PositionalEncoding(dtype=self.dtype)(x)
        y = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="ln")(y)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.head_size * self.num_heads,
            out_features=x.shape[-1],
            dtype=self.dtype,
            kernel_init=keras_mha_qkv_init(self.num_heads, self.head_size),
            out_kernel_init=keras_mha_out_init(self.num_heads),
            name="mha",
        )(y, inputs_k=enc)
        y = nn.Dropout(self.dropout, deterministic=not training)(y)
        return x + y


class RBlock(nn.Module):
    """Translator block: FF/2 -> cross-MHSA -> Conv -> FF/2 -> LN
    (conformer_blocks.py:472-510)."""

    input_dim: int
    dropout: float = 0.0
    fc_factor: float = 0.5
    head_size: int = 36
    num_heads: int = 4
    kernel_size: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, enc: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        x = FFModule(self.input_dim, self.dropout, self.fc_factor,
                     dtype=self.dtype, name="ff_module_1")(x, training)
        x = RMHSAModule(self.head_size, self.num_heads, self.dropout,
                        dtype=self.dtype, name="rmhsa")(x, enc, training)
        x = ConvModule(self.input_dim, self.kernel_size, self.dropout,
                       dtype=self.dtype, name="conv_module")(x, training)
        x = FFModule(self.input_dim, self.dropout, self.fc_factor,
                     dtype=self.dtype, name="ff_module_2")(x, training)
        return nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="ln")(x)
