"""Chunk-streaming (SMLTA2-style) Conformer — TPU-native, static shapes.

Re-designs the reference ChunkConformer family
(asr/models/chunk_conformer_blocks.py:23-1197 in Z-yq/TensorflowASR) as flax
modules whose streaming state is a pytree of FIXED-SIZE ring buffers instead
of the reference's growing ``tf.concat`` caches (which the reference trims
back to win_front / kernel_size each step anyway — :545-560 — so static
buffers are the natural TPU form):

- ChunkConvSubsampling   'valid' causal variant (:23-99); stream state =
                         [B, chunk/rf, n_mels, 1] mel tail
- ChunkMHSA              banded attention: query i attends
                         [i-win_front, i+win_back] with the reference's edge
                         adjustments (_compute_chunk_mask :158-176); stream
                         state = [B, win_front, 2*H*hd] POST-projection
                         K/V rows (row-local LN+projection computed once
                         at append — identical values, ~10x less matmul
                         per tick than re-projecting the ring)
- ChunkConv              causal depthwise-separable conv (:231-324); stream
                         state = [B, kernel_size-1, d] POST-GLU conv
                         inputs (same once-per-row principle)
- ChunkBlock             FF/2 -> ChunkMHSA -> ChunkConv -> FF/2 -> LN (:327-397)
- ChunkFront             'valid' mel + chunk subsampling (:400-458); stream
                         state = [B, chunk_num*hop] wav tail + mel tail
- ChunkStack             N blocks threading per-layer caches, valid/unvalid
                         (lookahead) split (:462-568)
- ChunkCTCDecoder        Dense -> M blocks -> Dense(classes) (:571-673)
- ContextHelper          phone embedding + blocks; text-only ``phone_call``
                         co-training path (:679-772)
- ChunkConformer         front -> encoder -> phone picker -> feature_pick ->
                         helper -> char decoder (:775-1197)

``feature_pick`` (the SMLTA2 CTC-picker / length regulator, :913-999) is a
fixed-capacity stable-argsort compaction instead of the reference's
dynamic-shape ``tf.while_loop`` + ``tf.repeat``.

Cold-start exactness. The reference's caches start at length 0 and GROW, so
its streaming path never sees fake history. Our fixed-size buffers start
zero-filled; exactness is restored by per-buffer validity bookkeeping:

- wav / mel-tail buffers: zeros ARE the offline causal zero padding — exact
  with no masking;
- attention: invalid buffer slots are masked out of the key set (LayerNorm
  of a zero row is the LN bias, i.e. a real key, so masking is required);
- causal conv: the conv input (post pw1/GLU) is zeroed at invalid slots —
  exactly the offline 'causal' zero pad, which keras applies at the conv
  input, not the block input.

With that, streaming from a cold start is numerically identical to the
offline path (tested in tests/test_chunk.py — the reference's strongest
consistency check, test_chunk_asr.py:126-139).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tensorflowasr_tpu.models.layers import (DepthwiseConv1D, FFModule,
                                             keras_kernel_init,
                                             keras_mha_out_init,
                                             keras_mha_qkv_init,
                                             glu, keras_embedding_init)
from tensorflowasr_tpu.ops import frontend as fe


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ChunkStackConfig:
    """One chunk-conformer stack (encoder / picker / decoder / helper)."""

    dmodel: int = 144
    num_blocks: int = 15
    head_size: int = 36
    num_heads: int = 4
    kernel_size: int = 32
    fc_factor: float = 0.5
    dropout: float = 0.0
    win_front: int = 36
    win_back: int = 0
    scan_layers: bool = False    # lax.scan over blocks (stacked params;
    #   ~num_blocks-fold faster compiles, e.g. the fused streaming step)
    scan_unroll: int = 1         # scan unroll factor (backward speed;
    #   see ChunkStack._scan)

    @property
    def lookahead(self) -> int:
        """EXACT streaming delay of this stack in frames.

        Per-block attention reaches ``win_back`` frames ahead, so the
        stack's receptive cone extends ``num_blocks * win_back`` frames —
        the reference documents exactly this ("latency = win_back x
        num_blocks x 40ms", chunk_conformerS.yml:21) but its streaming
        path only delays by win_back and emits approximate outputs for
        multi-block stacks (and for the encoder it DROPS the unvalid tail
        outright, chunk_conformer_blocks.py:544-560 + :827-831). We
        instead re-feed a ``lookahead``-frame input ring so streaming
        outputs equal offline exactly at any depth."""
        return self.num_blocks * self.win_back


@dataclasses.dataclass(frozen=True)
class ChunkConformerConfig:
    """Mirror of chunk_conformerS.yml model_config."""

    # front (ChunkConformerFront)
    dmodel: int = 144
    reduction_factor: int = 4
    front_dropout: float = 0.0
    sample_rate: int = 16000
    n_mels: int = 80
    mel_layer_trainable: bool = False
    stride_ms: int = 10
    chunk_num: int = 16          # mel frames per streaming step (>= 14)
    # on-device SpecAugment (training only; ops/specaug.py)
    spec_augment: bool = False
    specaug_freq_masks: int = 2
    specaug_freq_width: int = 27
    specaug_time_masks: int = 2
    specaug_time_ratio: float = 0.05
    # stacks
    encoder: ChunkStackConfig = ChunkStackConfig(num_blocks=15)
    picker: ChunkStackConfig = ChunkStackConfig(num_blocks=1)
    decoder: ChunkStackConfig = ChunkStackConfig(num_blocks=1, win_back=8)
    helper: ChunkStackConfig = ChunkStackConfig(num_blocks=2)
    dtype_str: str = "float32"
    # opt-in serving path: vectorize the per-chunk decoder micro-steps
    # into one batched pass (_fused_decoder_phase). Mathematically equal,
    # not bit-identical — keep False where exact sequential parity is
    # asserted (the CPU test suite), True for TPU serving throughput.
    fused_decoder: bool = False

    @property
    def dtype(self):
        return jnp.dtype(self.dtype_str)

    @property
    def hop(self) -> int:
        return self.sample_rate * self.stride_ms // 1000

    @property
    def chunk_samples(self) -> int:
        """Wav samples per streaming step (== wav_buf_length, :430)."""
        return self.chunk_num * self.hop

    @property
    def sub_length(self) -> int:
        """Encoder frames per streaming step (:438)."""
        return self.chunk_num // self.reduction_factor

    @classmethod
    def from_user_config(cls, config) -> "ChunkConformerConfig":
        mc = config["model_config"] or {}

        def stack(section, **defaults) -> ChunkStackConfig:
            d = dict(section or {})
            keys = ("dmodel", "num_blocks", "head_size", "num_heads",
                    "kernel_size", "fc_factor", "dropout", "win_front",
                    "win_back", "scan_layers", "scan_unroll")
            kw = {k: d[k] for k in keys if k in d}
            return ChunkStackConfig(**{**defaults, **kw})

        front = dict(mc.get("ChunkConformerFront") or {})
        return cls(
            dmodel=front.get("dmodel", 144),
            reduction_factor=front.get("reduction_factor", 4),
            front_dropout=front.get("dropout", 0.0),
            sample_rate=front.get("sample_rate", 16000),
            n_mels=front.get("n_mels", 80),
            mel_layer_trainable=front.get("mel_layer_trainable", False),
            stride_ms=front.get("stride_ms", 10),
            chunk_num=front.get("chunk_num", 16),
            spec_augment=front.get("spec_augment", False),
            fused_decoder=mc.get("fused_decoder", False),
            specaug_freq_masks=front.get("specaug_freq_masks", 2),
            specaug_freq_width=front.get("specaug_freq_width", 27),
            specaug_time_masks=front.get("specaug_time_masks", 2),
            specaug_time_ratio=front.get("specaug_time_ratio", 0.05),
            encoder=stack(mc.get("ChunkConformerEncoder"), num_blocks=15),
            picker=stack(mc.get("ChunkCTCPicker"), num_blocks=1),
            decoder=stack(mc.get("ChunkCTCDecoder"), num_blocks=1,
                          win_back=8),
            helper=stack(mc.get("ContextHelper"), num_blocks=2),
        )


# ---------------------------------------------------------------------------
# Masks / validity
# ---------------------------------------------------------------------------

def chunk_band_mask(t: int, win_front: int, win_back: int) -> jnp.ndarray:
    """Offline banded mask [t, t]: query i attends keys [i-wf, i+wb] with the
    reference's edge adjustments (_compute_chunk_mask, :158-176)."""
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    low = jnp.maximum(i - win_front, 0)
    high = jnp.minimum(i + win_back, t)
    low = low - jnp.maximum(low - (t - win_back), 0)
    high = high + jnp.maximum(win_back - high, 0)
    return (j >= low) & (j <= high)


def buffer_validity(cache_len: int, t: int, fill: jnp.ndarray,
                    skip: jnp.ndarray) -> jnp.ndarray:
    """[B, cache_len + t] bool: which concatenated-buffer slots hold REAL
    frames.

    fill [B]: real frames in the cache (right-aligned; zero-init slots form
    an invalid prefix). skip [B]: garbage slots at the FRONT of the input
    section (the not-yet-filled part of a lookahead ring).
    """
    length = cache_len + t
    j = jnp.arange(length)[None, :]
    fill = jnp.minimum(fill.astype(jnp.int32), cache_len)[:, None]
    skip = skip.astype(jnp.int32)[:, None]
    cache_ok = j >= (cache_len - fill)
    input_bad = (j >= cache_len) & (j < cache_len + skip)
    return cache_ok & ~input_bad


def left_compact_idx(valid: jnp.ndarray) -> jnp.ndarray:
    """[B, T] bool -> [B, T] gather indices that move the True rows to the
    FRONT, original order preserved (stable argsort on ~valid). Used by
    the fused decoder phase to pack a per-stream-variable number of real
    rows against a ring without data-dependent shapes."""
    return jnp.argsort(~valid, axis=1, stable=True)


def ring_append_dyn(ring: jnp.ndarray, rows: jnp.ndarray,
                    m: jnp.ndarray) -> jnp.ndarray:
    """Append the first ``m`` (per-stream, dynamic) of ``rows`` to a
    right-aligned ring and keep the last ``r`` entries — one
    take_along_axis instead of a data-dependent concat/slice.

    ring [B, r, d] (newest at the end), rows [B, T, d] with the rows to
    append LEFT-compacted (first m real, in order), m [B] int32.
    Output slot s (distance from end p = r - s): row m - p of ``rows``
    when p <= m, else ring slot s + m (shift by m).
    """
    r = ring.shape[1]
    if r == 0:
        return ring
    buf = jnp.concatenate([ring, rows], axis=1)
    s = jnp.arange(r)[None, :]
    p = r - s
    m = m.astype(jnp.int32)[:, None]
    idx = jnp.where(p <= m, r + m - p, s + m)
    return jnp.take_along_axis(buf, idx[..., None], axis=1)


def dyn_band_mask(ring_fill: jnp.ndarray, r: int, row_valid: jnp.ndarray,
                  win_front: int, win_back: int) -> jnp.ndarray:
    """Banded attention mask by REAL-ROW index for a buffer
    [ring(r) | rows(T)] whose real rows may have garbage holes between
    them (the fused decoder phase's kept-frame mask). Query row i with
    real index q attends keys with real index in [q - wf, q + wb] —
    identical to the positional band of the sequential path, where
    garbage only ever forms a contiguous prefix so positional and
    real-index banding coincide. Returns [B, 1, T, r + T]."""
    b, t = row_valid.shape
    ring_valid = jnp.arange(r)[None, :] >= (
        r - jnp.minimum(ring_fill.astype(jnp.int32), r)[:, None])
    valid = jnp.concatenate([ring_valid, row_valid], axis=1)  # [B, r+T]
    ri = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    q_ri = ri[:, r:]
    band = ((ri[:, None, :] >= q_ri[:, :, None] - win_front) &
            (ri[:, None, :] <= q_ri[:, :, None] + win_back))
    mask = band & valid[:, None, :] & row_valid[:, :, None]
    return mask[:, None]


def stream_band_mask(cache_len: int, t: int, win_front: int, win_back: int,
                     valid: jnp.ndarray) -> jnp.ndarray:
    """Streaming attention mask [B, 1, t, cache_len + t] = band ∧ validity.

    Queries are the t input frames appended after the cache; ``valid`` is
    ``buffer_validity(...)``.
    """
    length = cache_len + t
    p = cache_len + jnp.arange(t)[:, None]                   # local query idx
    j = jnp.arange(length)[None, :]
    low = jnp.maximum(p - win_front, 0)
    high = jnp.minimum(p + win_back, length)
    low = low - jnp.maximum(low - (length - win_back), 0)
    high = high + jnp.maximum(win_back - high, 0)
    band = (j >= low) & (j <= high)                          # [t, L]
    return band[None, None] & valid[:, None, None, :]        # [B, 1, t, L]


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class StreamableMHA(nn.Module):
    """Drop-in replacement for ``nn.MultiHeadDotProductAttention`` (same
    param tree: query/key/value/out DenseGenerals, same dot-product
    attention math as flax 0.12's default path) that ADDITIONALLY exposes
    the K/V projections so the streaming path can cache rows
    POST-projection. Re-projecting the whole ring every tick was ~10x
    redundant matmul work per block (and ~37x in the per-frame decoder
    micro-steps); the standalone C++ engine already caches K/V
    post-projection bit-identically (CLAUDE.md), this brings the TPU
    serving path in line."""

    num_heads: int
    head_dim: int
    out_features: int
    dtype: Any = jnp.float32

    def setup(self):
        import functools

        dense = functools.partial(
            nn.DenseGeneral, axis=-1, dtype=self.dtype,
            kernel_init=keras_mha_qkv_init(self.num_heads, self.head_dim),
            features=(self.num_heads, self.head_dim))
        self.query = dense(name="query")
        self.key = dense(name="key")
        self.value = dense(name="value")
        self.out = nn.DenseGeneral(features=self.out_features,
                                   axis=(-2, -1), dtype=self.dtype,
                                   kernel_init=keras_mha_out_init(
                                       self.num_heads),
                                   name="out")

    def project_kv(self, y: jnp.ndarray):
        """[..., t, d] -> (k, v) each [..., t, H, hd]."""
        return self.key(y), self.value(y)

    def attend(self, q_in: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        q = self.query(q_in)
        x = nn.dot_product_attention(q, k, v, mask=mask,
                                     deterministic=True,
                                     dtype=self.dtype)
        return self.out(x)

    def __call__(self, inputs_q, inputs_k=None, inputs_v=None, mask=None):
        inputs_k = inputs_k if inputs_k is not None else inputs_q
        inputs_v = inputs_v if inputs_v is not None else inputs_k
        k = self.key(inputs_k)
        v = self.value(inputs_v)
        return self.attend(inputs_q, k, v, mask)


class ChunkMHSA(nn.Module):
    """Banded self-attention with a fixed post-projection K/V ring
    ([B, win_front, 2 * H * hd]: k rows then v rows packed along the last
    axis)."""

    dmodel: int
    head_size: int
    num_heads: int
    dropout: float = 0.0
    win_front: int = 36
    win_back: int = 0
    dtype: Any = jnp.float32

    def setup(self):
        self.ln = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="ln")
        self.mha = StreamableMHA(
            num_heads=self.num_heads, head_dim=self.head_size,
            out_features=self.dmodel, dtype=self.dtype, name="mha")
        self.do = nn.Dropout(self.dropout)

    def __call__(self, x: jnp.ndarray, training: bool = False,
                 t_valid=None) -> jnp.ndarray:
        t = x.shape[1]
        mask = chunk_band_mask(t, self.win_front, self.win_back)[None, None]
        if t_valid is not None:
            # emulate a width-t_valid buffer (reference grows its pick
            # buffer dynamically): keys at positions >= t_valid do not
            # exist there, so ban them here (win_back can otherwise leak
            # them into the last valid rows)
            mask = mask & (jnp.arange(t) < t_valid)[None, None, None, :]
        y = self.ln(x)
        y = self.mha(y, inputs_k=y, inputs_v=y, mask=mask)
        y = self.do(y, deterministic=not training)
        return x + y

    def stream_call(self, x: jnp.ndarray, cache: jnp.ndarray,
                    valid: jnp.ndarray, keep: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [B, t, d] pre-LN module inputs; cache [B, win_front,
        2 * H * hd] POST-projection K/V rows for the past win_front
        frames (identical values to re-projecting the old pre-LN input
        ring — LN and the K/V projections are row-local); valid
        [B, win_front + t] buffer validity; keep [B, n_keep, 1] mask
        selecting which of the first n_keep input frames advance into
        the cache (zeroed where garbage — those slots are always masked
        out of the attention band, so the stored value never matters)."""
        b, t = x.shape[0], x.shape[1]
        h, hd = self.num_heads, self.head_size
        y = self.ln(x)
        k_new, v_new = self.mha.project_kv(y)          # [B, t, H, hd]
        kv = cache.reshape(b, self.win_front, 2, h, hd)
        k = jnp.concatenate([kv[:, :, 0], k_new], axis=1)
        v = jnp.concatenate([kv[:, :, 1], v_new], axis=1)
        mask = stream_band_mask(self.win_front, t, self.win_front,
                                self.win_back, valid)
        out = self.mha.attend(y, k, v, mask)
        n_keep = keep.shape[1]
        app = jnp.stack([k_new[:, :n_keep], v_new[:, :n_keep]], axis=2)
        app = jnp.where(keep[..., None, None], app, 0.0)
        new_cache = jnp.concatenate(
            [kv, app], axis=1)[:, -self.win_front:]
        return x + out, new_cache.reshape(b, self.win_front, 2 * h * hd)

    def stream_call_dyn(self, x: jnp.ndarray, cache: jnp.ndarray,
                        fill: jnp.ndarray, row_valid: jnp.ndarray,
                        adv_mask: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Dynamic-count variant of ``stream_call`` for the fused decoder
        phase: real input rows sit at arbitrary positions (``row_valid``,
        garbage holes allowed), and only the ``adv_mask`` subset advances
        into the K/V ring — appended in temporal order via a compacting
        gather, so the ring stays garbage-free (contiguous valid suffix
        ``fill``). Attention is banded by real-row index
        (``dyn_band_mask``), which equals the sequential path's
        positional band. Outputs at garbage rows are garbage."""
        b, t = x.shape[0], x.shape[1]
        h, hd = self.num_heads, self.head_size
        y = self.ln(x)
        k_new, v_new = self.mha.project_kv(y)          # [B, t, H, hd]
        kv = cache.reshape(b, self.win_front, 2, h, hd)
        k = jnp.concatenate([kv[:, :, 0], k_new], axis=1)
        v = jnp.concatenate([kv[:, :, 1], v_new], axis=1)
        mask = dyn_band_mask(fill, self.win_front, row_valid,
                             self.win_front, self.win_back)
        out = self.mha.attend(y, k, v, mask)
        packed = jnp.stack([k_new, v_new], axis=2).reshape(
            b, t, 2 * h * hd)
        lc = left_compact_idx(adv_mask)
        rows = jnp.take_along_axis(packed, lc[..., None], axis=1)
        new_cache = ring_append_dyn(
            cache, rows, jnp.sum(adv_mask, axis=1))
        return x + out, new_cache


class ChunkConv(nn.Module):
    """Causal conformer conv module with a fixed [B, kernel, d] input ring.

    The conv input (post pw1/GLU) is zeroed at invalid buffer slots, which
    is exactly the offline 'causal' left zero pad (keras pads the conv
    input), so streaming matches offline from a cold start.
    """

    dmodel: int
    kernel_size: int = 32
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        self.ln = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="ln")
        self.pw_conv_1 = nn.Dense(2 * self.dmodel, dtype=self.dtype,
                                  kernel_init=keras_kernel_init(),
                                  name="pw_conv_1")
        # shifted-slice depthwise (layers.DepthwiseConv1D): same params,
        # GSPMD-safe gradients, no MXU-hostile grouped conv
        self.dw_conv = DepthwiseConv1D(self.dmodel, self.kernel_size,
                                       padding="CAUSAL", dtype=self.dtype,
                                       name="dw_conv")
        self.dw_pw = nn.Dense(2 * self.dmodel, dtype=self.dtype,
                              kernel_init=keras_kernel_init(),
                              name="dw_pw")
        self.bn = nn.BatchNorm(epsilon=1e-3, dtype=jnp.float32,
                                name="bn")
        self.pw_conv_2 = nn.Dense(self.dmodel, dtype=self.dtype,
                                  kernel_init=keras_kernel_init(),
                                  name="pw_conv_2")
        self.do = nn.Dropout(self.dropout)

    def _body(self, x: jnp.ndarray, training: bool,
              conv_in_valid=None, t_valid=None) -> jnp.ndarray:
        y = self.ln(x)
        y = self.pw_conv_1(y)
        y = glu(y)
        if conv_in_valid is not None:
            y = jnp.where(conv_in_valid[..., None], y, 0.0)
        y = self.dw_conv(y)
        y = self.dw_pw(y)
        if t_valid is not None:
            # width-t_valid buffer emulation: positions past t_valid do
            # not exist in the reference's dynamically-sized pick buffer,
            # so they must not contribute to the batch statistics
            bn_mask = (jnp.arange(y.shape[1]) < t_valid)[None, :, None]
            y = self.bn(y, use_running_average=not training, mask=bn_mask)
        else:
            y = self.bn(y, use_running_average=not training)
        y = nn.swish(y)
        y = self.pw_conv_2(y)
        return self.do(y, deterministic=not training)

    def __call__(self, x: jnp.ndarray, training: bool = False,
                 t_valid=None) -> jnp.ndarray:
        return x + self._body(x, training, t_valid=t_valid)

    def stream_call(self, x: jnp.ndarray, cache: jnp.ndarray,
                    valid: jnp.ndarray, keep: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """cache [B, kernel_size - 1, d] POST-GLU conv-input rows (the
        values the causal depthwise window needs from the past — zeroed
        at invalid slots, which is exactly the zeroing ``_body`` applied
        at use time, so numerics are unchanged while ln/pw1/GLU run on
        the t NEW rows only and dw_pw/bn/swish/pw2 on the t outputs
        only); valid [B, kernel_size + t] buffer validity; keep
        [B, n_keep, 1] cache-advance mask (see ChunkMHSA.stream_call)."""
        t = x.shape[1]
        y = self.ln(x)
        y = self.pw_conv_1(y)
        y = glu(y)
        y = jnp.where(valid[:, self.kernel_size:, None], y, 0.0)
        buf = jnp.concatenate([cache, y], axis=1)   # [B, k-1+t, d]
        z = self.dw_conv(buf, pad=(0, 0))           # VALID -> [B, t, d]
        z = self.dw_pw(z)
        z = self.bn(z, use_running_average=True)
        z = nn.swish(z)
        z = self.pw_conv_2(z)
        appended = jnp.where(keep, y[:, :keep.shape[1]], 0.0)
        new_cache = jnp.concatenate(
            [cache, appended], axis=1)[:, -(self.kernel_size - 1):]
        return x + z, new_cache

    def stream_call_dyn(self, x: jnp.ndarray, cache: jnp.ndarray,
                        row_valid: jnp.ndarray, adv_mask: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Dynamic-count variant for the fused decoder phase. The causal
        depthwise window needs the real rows ADJACENT, so the post-GLU
        rows are left-compacted against the ring (whose zero slots are
        exactly the stream-start causal pad, garbage-free by
        construction), convolved, and scattered back to their original
        positions. Only ``adv_mask`` rows enter the ring."""
        y = self.ln(x)
        y = self.pw_conv_1(y)
        y = glu(y)
        y = jnp.where(row_valid[..., None], y, 0.0)
        lc = left_compact_idx(row_valid)
        inv = jnp.argsort(lc, axis=1)
        y_c = jnp.take_along_axis(y, lc[..., None], axis=1)
        buf = jnp.concatenate([cache, y_c], axis=1)   # [B, k-1+t, d]
        z_c = self.dw_conv(buf, pad=(0, 0))           # VALID -> [B, t, d]
        z = jnp.take_along_axis(z_c, inv[..., None], axis=1)
        z = self.dw_pw(z)
        z = self.bn(z, use_running_average=True)
        z = nn.swish(z)
        z = self.pw_conv_2(z)
        rows = jnp.take_along_axis(
            y, left_compact_idx(adv_mask)[..., None], axis=1)
        new_cache = ring_append_dyn(
            cache, rows, jnp.sum(adv_mask, axis=1))
        return x + z, new_cache


class ChunkBlock(nn.Module):
    """FF/2 -> ChunkMHSA -> ChunkConv -> FF/2 -> LN (:327-397)."""

    cfg: ChunkStackConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.ffm1 = FFModule(c.dmodel, c.dropout, c.fc_factor,
                             dtype=self.dtype, name="ff_module_1")
        self.mhsam = ChunkMHSA(c.dmodel, c.head_size, c.num_heads, c.dropout,
                               c.win_front, c.win_back, dtype=self.dtype,
                               name="mhsa")
        self.convm = ChunkConv(c.dmodel, c.kernel_size, c.dropout,
                               dtype=self.dtype, name="conv_module")
        self.ffm2 = FFModule(c.dmodel, c.dropout, c.fc_factor,
                             dtype=self.dtype, name="ff_module_2")
        self.ln = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name="ln")

    def __call__(self, x: jnp.ndarray, training: bool = False,
                 t_valid=None) -> jnp.ndarray:
        x = self.ffm1(x, training)
        x = self.mhsam(x, training, t_valid=t_valid)
        x = self.convm(x, training, t_valid=t_valid)
        x = self.ffm2(x, training)
        return self.ln(x)

    def stream_call(self, x, mha_cache, cnn_cache, fill, skip, n_keep):
        """n_keep: how many leading input frames advance into the caches
        (t - stack win_back); frames below ``skip`` are garbage ring slots
        and are zeroed before caching."""
        t = x.shape[1]
        c = self.cfg
        mha_valid = buffer_validity(c.win_front, t, fill, skip)
        cnn_valid = buffer_validity(c.kernel_size, t, fill, skip)
        keep = (jnp.arange(n_keep)[None, :] >= skip[:, None])[..., None]
        x = self.ffm1(x, False)
        x, new_mha = self.mhsam.stream_call(x, mha_cache, mha_valid, keep)
        x, new_cnn = self.convm.stream_call(x, cnn_cache, cnn_valid, keep)
        x = self.ffm2(x, False)
        return self.ln(x), new_mha, new_cnn

    def stream_call_dyn(self, x, mha_cache, cnn_cache, fill, row_valid,
                        adv_mask):
        """Dynamic-count block step (fused decoder phase)."""
        x = self.ffm1(x, False)
        x, new_mha = self.mhsam.stream_call_dyn(x, mha_cache, fill,
                                                row_valid, adv_mask)
        x, new_cnn = self.convm.stream_call_dyn(x, cnn_cache, row_valid,
                                                adv_mask)
        x = self.ffm2(x, False)
        return self.ln(x), new_mha, new_cnn


class ChunkConvSubsampling(nn.Module):
    """'valid'-padding causal subsampling (:23-99).

    Offline: pad time [rf, 0] + freq [2, 2], two 3x3 VALID convs with
    strides (rf/2, 2) and (2, 2). Streaming: a [B, chunk/rf, n_mels, 1] mel
    tail is prepended (no time pad — zero init == the offline time pad),
    keep the last chunk/rf frames.
    """

    odim: int
    chunk_num: int = 16
    reduction_factor: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.float32

    def setup(self):
        assert self.reduction_factor % 2 == 0
        self.conv1 = nn.Conv(self.odim, (3, 3),
                             strides=(self.reduction_factor // 2, 2),
                             padding="VALID", dtype=self.dtype,
                             kernel_init=keras_kernel_init(), name="conv1")
        self.conv2 = nn.Conv(self.odim, (3, 3), strides=(2, 2),
                             padding="VALID", dtype=self.dtype,
                             kernel_init=keras_kernel_init(), name="conv2")
        self.linear = nn.Dense(self.odim, dtype=self.dtype,
                               kernel_init=keras_kernel_init(),
                               name="linear")
        self.do = nn.Dropout(self.dropout)
        self.sub_length = self.chunk_num // self.reduction_factor

    def _convs(self, x: jnp.ndarray, training: bool) -> jnp.ndarray:
        x = nn.relu(self.conv1(x.astype(self.dtype)))
        x = nn.relu(self.conv2(x))
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = self.linear(x)
        return self.do(x, deterministic=not training)

    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        x = jnp.pad(x, [(0, 0), (self.reduction_factor, 0), (2, 2), (0, 0)])
        return self._convs(x, training)

    def stream_call(self, x: jnp.ndarray, sub_cache: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [B, chunk_num, n_mels, 1]; sub_cache [B, chunk/rf, n_mels, 1]."""
        full = jnp.concatenate([sub_cache, x], axis=1)
        y = jnp.pad(full, [(0, 0), (0, 0), (2, 2), (0, 0)])
        y = self._convs(y, training=False)[:, -self.sub_length:]
        new_cache = full[:, -self.sub_length:]
        return y, new_cache

    def init_cache(self, batch: int, n_mels: int) -> jnp.ndarray:
        return jnp.zeros((batch, self.sub_length, n_mels, 1), jnp.float32)


class ChunkFront(nn.Module):
    """'valid' (causal) mel + chunk subsampling (:400-458).

    The streaming wav tail buffer starts at zero, which equals the offline
    mel 'valid' left zero padding exactly — no masking needed.
    """

    cfg: ChunkConformerConfig

    def setup(self):
        c = self.cfg
        self.sub = ChunkConvSubsampling(
            c.dmodel, c.chunk_num, c.reduction_factor, c.front_dropout,
            dtype=c.dtype, name="conv_subsampling")
        self.fcfg = fe.LogMelFrontendConfig(
            sample_rate=c.sample_rate, n_fft=1024, stride_ms=c.stride_ms,
            n_mels=c.n_mels, padding="valid")
        if c.mel_layer_trainable:
            init_fb = fe.mel_filterbank(c.sample_rate, 1024, c.n_mels)
            self.mel_weights = self.param(
                "freq2mel", lambda key: jnp.asarray(init_fb))
        else:
            self.mel_weights = None

    def _mel(self, wav: jnp.ndarray) -> jnp.ndarray:
        wav = fe.wav_to_float(wav)
        if wav.ndim == 3:
            wav = wav[..., 0]
        return fe.log_mel_spectrogram(wav, self.fcfg,
                                      mel_weights=self.mel_weights)

    def __call__(self, wav: jnp.ndarray, training: bool = False
                 ) -> jnp.ndarray:
        mel = self._mel(wav)
        if training and self.cfg.spec_augment:
            from tensorflowasr_tpu.ops.specaug import spec_augment

            c = self.cfg
            mel = spec_augment(
                mel, self.make_rng("dropout"),
                n_freq_masks=c.specaug_freq_masks,
                freq_width=c.specaug_freq_width,
                n_time_masks=c.specaug_time_masks,
                time_ratio=c.specaug_time_ratio)
        return self.sub(mel[..., None], training)

    def stream_call(self, wav: jnp.ndarray, wav_cache: jnp.ndarray,
                    sub_cache: jnp.ndarray):
        """wav [B, chunk_samples]; wav_cache [B, chunk_samples] tail."""
        c = self.cfg
        wav = fe.wav_to_float(wav)
        if wav.ndim == 3:
            wav = wav[..., 0]
        full = jnp.concatenate([wav_cache, wav], axis=1)
        mel = self._mel(full)[:, -c.chunk_num:]
        out, new_sub = self.sub.stream_call(mel[..., None], sub_cache)
        return out, full[:, -c.chunk_samples:], new_sub

    def init_caches(self, batch: int):
        c = self.cfg
        return (jnp.zeros((batch, c.chunk_samples), jnp.float32),
                self.sub.init_cache(batch, c.n_mels))


class ChunkStack(nn.Module):
    """N ChunkBlocks threading per-layer [L, B, wf, d] / [L, B, k, d] caches
    with valid/unvalid lookahead split (:462-568). With
    ``cfg.scan_layers`` the blocks run under function-level ``nn.scan``
    over ONE child block with stacked [L, ...] params — one traced block
    instead of N, shared between the offline and streaming paths."""

    cfg: ChunkStackConfig
    dtype: Any = jnp.float32

    def setup(self):
        if self.cfg.scan_layers:
            self.block = ChunkBlock(self.cfg, dtype=self.dtype,
                                    name="block")
        else:
            self.blocks = [
                ChunkBlock(self.cfg, dtype=self.dtype, name=f"block_{i}")
                for i in range(self.cfg.num_blocks)]

    def _scan(self, body):
        # scan_unroll trades compile time back for backward speed (the
        # scan bwd's stacked-grad accumulation is ~2x the unrolled loop on
        # TPU) while keeping the stacked param layout — set it to
        # num_blocks for TRAINING configs, leave 1 for the fused
        # streaming compiles (inference-only, no backward)
        return nn.scan(
            body,
            variable_axes={"params": 0, "batch_stats": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.cfg.num_blocks,
            unroll=max(1, min(self.cfg.scan_unroll, self.cfg.num_blocks)))

    def __call__(self, x: jnp.ndarray, training: bool = False,
                 t_valid=None) -> jnp.ndarray:
        if self.cfg.scan_layers:
            def body(block, carry, _):
                return block(carry, training, t_valid=t_valid), None

            # blocks end in f32 LN -> f32 inter-block carry
            out, _ = self._scan(body)(self.block,
                                      x.astype(jnp.float32), None)
            return out
        for b in self.blocks:
            x = b(x, training, t_valid=t_valid)
        return x

    def stream_call(self, x: jnp.ndarray, mha_caches, cnn_caches,
                    fill: jnp.ndarray, skip: jnp.ndarray):
        """Process t input frames (the first ``skip`` per batch are ring
        zero-slots); caches advance past the t - lookahead frames that gain
        full lookahead this step, minus the skipped slots (the reference
        trims by win_back only, :530-560 — approximate for multi-block
        stacks; see ChunkStackConfig.lookahead). Garbage never enters a
        cache: appended slots below ``skip`` are zeroed and counted out of
        ``fill``.

        Returns (out [B, t, d], new_mha, new_cnn, new_fill). Output frames
        [skip, t - lookahead) are final; the rest are lookahead/garbage.
        """
        c = self.cfg
        t = x.shape[1]
        n_keep = t - c.lookahead
        appended_real = jnp.maximum(n_keep - skip, 0)
        if c.scan_layers:
            def body(block, carry, caches):
                xc, fl, sk = carry
                mha_c, cnn_c = caches
                out, new_mha, new_cnn = block.stream_call(
                    xc, mha_c, cnn_c, fl, sk, n_keep)
                return (out, fl, sk), (new_mha, new_cnn)

            (out, _, _), (new_mha, new_cnn) = self._scan(body)(
                self.block, (x.astype(jnp.float32), fill, skip),
                (mha_caches, cnn_caches))
            return out, new_mha, new_cnn, fill + appended_real
        new_mha, new_cnn = [], []
        layer_in = x
        for i, b in enumerate(self.blocks):
            out, mha_c, cnn_c = b.stream_call(
                layer_in, mha_caches[i], cnn_caches[i], fill, skip, n_keep)
            new_mha.append(mha_c)
            new_cnn.append(cnn_c)
            layer_in = out
        new_fill = fill + appended_real
        return layer_in, jnp.stack(new_mha), jnp.stack(new_cnn), new_fill

    def stream_call_dyn(self, x: jnp.ndarray, mha_caches, cnn_caches,
                        fill: jnp.ndarray, row_valid: jnp.ndarray,
                        adv_mask: jnp.ndarray):
        """Dynamic-count stack step for the fused decoder phase: real rows
        marked by ``row_valid`` (holes allowed), the ``adv_mask`` subset
        advances into every block's rings. Same every-block-sees-the-
        same-masks structure as ``stream_call``."""
        if self.cfg.scan_layers:
            def body(block, carry, caches):
                xc, fl = carry
                mha_c, cnn_c = caches
                out, new_mha, new_cnn = block.stream_call_dyn(
                    xc, mha_c, cnn_c, fl, row_valid, adv_mask)
                return (out, fl), (new_mha, new_cnn)

            (out, _), (new_mha, new_cnn) = self._scan(body)(
                self.block, (x.astype(jnp.float32), fill),
                (mha_caches, cnn_caches))
        else:
            new_mha, new_cnn = [], []
            out = x
            for i, b in enumerate(self.blocks):
                out, mha_c, cnn_c = b.stream_call_dyn(
                    out, mha_caches[i], cnn_caches[i], fill, row_valid,
                    adv_mask)
                new_mha.append(mha_c)
                new_cnn.append(cnn_c)
            new_mha, new_cnn = jnp.stack(new_mha), jnp.stack(new_cnn)
        new_fill = fill + jnp.sum(adv_mask, axis=1).astype(fill.dtype)
        return out, new_mha, new_cnn, new_fill

    def init_caches(self, batch: int):
        # post-projection rings: K/V rows packed [.., wf, 2*H*hd] and
        # post-GLU conv rows [.., k-1, d], in the computation dtype (the
        # values cached are exactly what the projections/GLU emit)
        c = self.cfg
        kv = 2 * c.num_heads * c.head_size
        return (jnp.zeros((c.num_blocks, batch, c.win_front, kv),
                          self.dtype),
                jnp.zeros((c.num_blocks, batch, c.kernel_size - 1,
                           c.dmodel), self.dtype))


class ChunkCTCDecoder(nn.Module):
    """Dense proj -> M ChunkBlocks -> Dense(classes); returns (logits,
    hidden) (:571-673)."""

    cfg: ChunkStackConfig
    num_classes: int
    dtype: Any = jnp.float32

    def setup(self):
        self.project = nn.Dense(self.cfg.dmodel, dtype=self.dtype,
                                kernel_init=keras_kernel_init(),
                                name="project")
        self.stack = ChunkStack(self.cfg, dtype=self.dtype, name="stack")
        self.fc = nn.Dense(self.num_classes, dtype=jnp.float32,
                           kernel_init=keras_kernel_init(),
                           name="fully_connected")

    def __call__(self, x: jnp.ndarray, training: bool = False,
                 t_valid=None):
        hidden = self.stack(self.project(x.astype(self.dtype)), training,
                            t_valid=t_valid)
        return self.fc(hidden.astype(jnp.float32)), hidden

    def stream_call(self, x: jnp.ndarray, mha_caches, cnn_caches, fill, skip):
        y = self.project(x.astype(self.dtype))
        out, new_mha, new_cnn, new_fill = self.stack.stream_call(
            y, mha_caches, cnn_caches, fill, skip)
        return (self.fc(out.astype(jnp.float32)), out, new_mha, new_cnn,
                new_fill)

    def stream_call_dyn(self, x, mha_caches, cnn_caches, fill, row_valid,
                        adv_mask):
        y = self.project(x.astype(self.dtype))
        out, new_mha, new_cnn, new_fill = self.stack.stream_call_dyn(
            y, mha_caches, cnn_caches, fill, row_valid, adv_mask)
        return (self.fc(out.astype(jnp.float32)), out, new_mha, new_cnn,
                new_fill)

    def init_caches(self, batch: int):
        return self.stack.init_caches(batch)


class ContextHelper(nn.Module):
    """Phone-embedding helper stack (:679-772): (a) refines picked acoustic
    features, (b) ``phone_call`` is the text-only co-training branch."""

    cfg: ChunkStackConfig
    num_classes: int
    dtype: Any = jnp.float32

    def setup(self):
        self.sample_helper = nn.Embed(self.num_classes, self.cfg.dmodel,
                                      dtype=self.dtype,
                                      embedding_init=keras_embedding_init(),
                                      name="sample_helper")
        self.stack = ChunkStack(self.cfg, dtype=self.dtype, name="stack")

    def __call__(self, x: jnp.ndarray, training: bool = False,
                 t_valid=None) -> jnp.ndarray:
        return self.stack(x, training, t_valid=t_valid)

    def phone_call(self, phone_ids: jnp.ndarray, training: bool = False):
        emb = self.sample_helper(phone_ids)
        return emb, self.stack(emb, training)

    def stream_call(self, x: jnp.ndarray, mha_caches, cnn_caches, fill,
                    skip: jnp.ndarray | None = None):
        if skip is None:
            skip = jnp.zeros_like(fill)
        out, new_mha, new_cnn, new_fill = self.stack.stream_call(
            x, mha_caches, cnn_caches, fill, skip)
        return out, new_mha, new_cnn, new_fill

    def stream_call_dyn(self, x, mha_caches, cnn_caches, fill, row_valid,
                        adv_mask):
        return self.stack.stream_call_dyn(x, mha_caches, cnn_caches, fill,
                                          row_valid, adv_mask)

    def init_caches(self, batch: int):
        return self.stack.init_caches(batch)


# ---------------------------------------------------------------------------
# feature_pick — the SMLTA2 CTC picker / length regulator
# ---------------------------------------------------------------------------

def feature_pick(hidden: jnp.ndarray, ctc_logits: jnp.ndarray,
                 blank_id: int, max_out: int | None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Keep frames whose argmax phone is non-blank (:913-999), compacted to
    the front of a static [B, max_out, ...] buffer, zero padded.

    Returns (picked_hidden [B, max_out, d], picked_ctc [B, max_out, V],
    counts [B]). ``max_out=None`` uses the full frame count — capacity can
    then never truncate a pick, matching the reference's dynamically-grown
    buffer (:920-923, max_durations >= every row's non-blank count); the
    VALUE-dynamic part of the reference's T lives in the callers' CTC
    lengths, keeping shapes static for XLA. An int cap drops frames beyond
    the first ``max_out`` kept (serving paths with fixed budgets).
    """
    if max_out is None:
        max_out = hidden.shape[1]
    ids = jnp.argmax(ctc_logits, axis=-1)
    keep = ids != blank_id                                        # [B, T]
    order = jnp.argsort(~keep, axis=1, stable=True)[:, :max_out]  # [B, max_out]
    kept = jnp.take_along_axis(keep, order, axis=1)
    f = jnp.take_along_axis(hidden, order[..., None], axis=1)
    c = jnp.take_along_axis(ctc_logits, order[..., None], axis=1)
    f = jnp.where(kept[..., None], f, 0.0)
    c = jnp.where(kept[..., None], c, 0.0)
    counts = jnp.minimum(keep.sum(axis=1), max_out).astype(jnp.int32)
    return f, c, counts


# ---------------------------------------------------------------------------
# Top-level model
# ---------------------------------------------------------------------------

class ChunkConformer(nn.Module):
    """front -> encoder -> phone picker -> feature_pick -> helper -> char
    decoder (:775-1197). Streaming state is an explicit pytree dict."""

    cfg: ChunkConformerConfig
    num_phone_classes: int
    num_char_classes: int

    def setup(self):
        c = self.cfg
        self.front = ChunkFront(c, name="front")
        self.encoder = ChunkStack(c.encoder, dtype=c.dtype, name="encoder")
        self.phone_picker = ChunkCTCDecoder(
            c.picker, self.num_phone_classes, dtype=c.dtype,
            name="phone_picker")
        self.decoder = ChunkCTCDecoder(
            c.decoder, self.num_char_classes, dtype=c.dtype, name="decoder")
        self.helper = ContextHelper(
            c.helper, self.num_phone_classes, dtype=c.dtype, name="helper")

    @property
    def phone_blank(self) -> int:
        return self.num_phone_classes - 1

    # -- offline ----------------------------------------------------------
    def __call__(self, wav: jnp.ndarray, training: bool = False):
        """Build/eval forward (reference call :1003-1009): no picking."""
        front_out = self.front(wav, training)
        enc = self.encoder(front_out, training)
        _, hidden = self.phone_picker(enc, training)
        return self.decoder(hidden, training)

    def encode_to_phones(self, wav: jnp.ndarray, training: bool = False):
        """front -> encoder -> picker: (phone_logits, hidden)."""
        front_out = self.front(wav, training)
        enc = self.encoder(front_out, training)
        return self.phone_picker(enc, training)

    def train_forward(self, wav: jnp.ndarray, extra_phones: jnp.ndarray,
                      max_pick: int | None, training: bool = True,
                      label_width: int | None = None):
        """Full 3-branch forward (train_step :1034-1083).

        With ``max_pick=None`` + ``label_width`` (padded phone-label
        width), the reference's dynamically-sized pick buffer (:920-923,
        T = max(batch max picked count, label width)) is emulated exactly
        on static shapes: the buffer holds every encoder frame, and the
        helper/decoder stacks run width-T semantics via ``t_valid``
        (attention keys and BN statistics stop at T). ``t_ref`` in the
        returned dict is that T (None when a fixed cap is given).

        Returns dict with phone_logits [B,T,Vp], picked_counts [B],
        txt_logits [B,cap,Vc] (decoder on helper(picked)), help_logits
        [B,Ue,Vc] (decoder on helper.phone_call(extra_phones)), t_ref."""
        phone_logits, hidden = self.encode_to_phones(wav, training)
        picked_f, _, picked_counts = feature_pick(
            hidden, phone_logits, self.phone_blank, max_pick)
        t_ref = None
        if max_pick is None and label_width is not None:
            t_ref = jnp.clip(
                jnp.maximum(jnp.max(picked_counts), label_width),
                1, picked_f.shape[1])
        _, helper_out = self.helper.phone_call(extra_phones, training)
        picked_help = self.helper(picked_f, training, t_valid=t_ref)
        txt_logits, _ = self.decoder(picked_help, training, t_valid=t_ref)
        help_logits, _ = self.decoder(helper_out, training)
        return {
            "phone_logits": phone_logits,
            "picked_counts": picked_counts,
            "txt_logits": txt_logits,
            "help_logits": help_logits,
            "t_ref": t_ref,
        }

    def predict(self, wav: jnp.ndarray, max_pick: int | None):
        """Offline inference (reference predict :816-823): char logits over
        the picked frames + phone logits + picked counts. ``None`` = the
        reference's uncapped eval pick (T = batch max picked count),
        emulated via ``t_valid`` width semantics."""
        phone_logits, hidden = self.encode_to_phones(wav, False)
        picked_f, _, counts = feature_pick(
            hidden, phone_logits, self.phone_blank, max_pick)
        t_ref = None
        if max_pick is None:
            t_ref = jnp.clip(jnp.max(counts), 1, picked_f.shape[1])
        help_out = self.helper(picked_f, False, t_valid=t_ref)
        char_logits, _ = self.decoder(help_out, False, t_valid=t_ref)
        return char_logits, phone_logits, counts

    # -- streaming --------------------------------------------------------
    def init_picker_caches(self, batch: int) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        wav_cache, sub_cache = self.front.init_caches(batch)
        enc_mha, enc_cnn = self.encoder.init_caches(batch)
        pk_mha, pk_cnn = self.phone_picker.init_caches(batch)
        z = jnp.zeros((batch,), jnp.int32)
        caches = {
            "wav": wav_cache, "sub": sub_cache,
            "enc_mha": enc_mha, "enc_cnn": enc_cnn, "enc_fill": z,
            "picker_mha": pk_mha, "picker_cnn": pk_cnn, "picker_fill": z,
            # lookahead ring: frames fed to the picker but not yet final
            "ring": jnp.zeros((batch, c.picker.lookahead, c.dmodel),
                              jnp.float32),
            "ring_fill": z,
        }
        if c.encoder.lookahead > 0:
            # encoder lookahead ring (front outputs awaiting full lookahead;
            # the reference drops these frames instead — see
            # ChunkStackConfig.lookahead). Keys only exist when configured,
            # so shipped-config cache pytrees (and their exports / native
            # engine layouts) are unchanged.
            caches["enc_ring"] = jnp.zeros(
                (batch, c.encoder.lookahead, c.dmodel), jnp.float32)
            caches["enc_ring_fill"] = z
        return caches

    def init_decoder_caches(self, batch: int) -> Dict[str, jnp.ndarray]:
        c = self.cfg
        h_mha, h_cnn = self.helper.init_caches(batch)
        d_mha, d_cnn = self.decoder.init_caches(batch)
        z = jnp.zeros((batch,), jnp.int32)
        caches = {
            "helper_mha": h_mha, "helper_cnn": h_cnn, "helper_fill": z,
            "dec_mha": d_mha, "dec_cnn": d_cnn, "dec_fill": z,
            "ring": jnp.zeros((batch, c.decoder.lookahead, c.dmodel),
                              jnp.float32),
            "ring_fill": z,
        }
        if c.helper.lookahead > 0:
            caches["helper_ring"] = jnp.zeros(
                (batch, c.helper.lookahead, c.dmodel), jnp.float32)
            caches["helper_ring_fill"] = z
        return caches

    @staticmethod
    def _ring_feed(ring, ring_fill, new, wb, in_skip=None):
        """Prepend a right-aligned lookahead ring to ``new`` frames.

        ``in_skip`` [B] marks a garbage PREFIX of ``new`` (warm-up frames
        of an upstream ring that have not produced real outputs yet). Real
        frames always form a contiguous suffix of the buffer: an upstream
        ring's skip strictly shrinks by t per step, so once any real frame
        has flowed (ring_fill > 0) the upstream skip is already 0 — garbage
        never lands between two real runs.

        Returns (x [B, wb + t, d], skip [B], new_ring, new_ring_fill,
        n_final [B]): output slots [skip, t) of the first t gain full
        lookahead; the LAST n_final = t - skip of them are real."""
        t = new.shape[1]
        b = new.shape[0]
        if in_skip is None:
            in_skip = jnp.zeros((b,), jnp.int32)
        if wb == 0:
            return (new, in_skip.astype(jnp.int32), ring, ring_fill,
                    jnp.maximum(t - in_skip, 0).astype(jnp.int32))
        x = jnp.concatenate([ring, new], axis=1)
        skip = ((wb - jnp.minimum(ring_fill, wb)) + in_skip).astype(jnp.int32)
        new_ring = x[:, -wb:]
        new_ring_fill = jnp.minimum(
            ring_fill + jnp.maximum(t - in_skip, 0), wb).astype(jnp.int32)
        n_final = jnp.maximum(t - skip, 0).astype(jnp.int32)
        return x, skip, new_ring, new_ring_fill, n_final

    def picker_stream_step(self, wav_chunk: jnp.ndarray,
                           caches: Dict[str, jnp.ndarray]):
        """One streaming step (picker_stream_predict :824-840).

        wav_chunk [B, chunk_samples] -> (phone_logits [B, t, Vp], hidden
        [B, t, d], n_final [B], new caches) where t = sub_length final
        frames per step; the LAST n_final of them are real outputs (fewer
        than t only during lookahead warm-up; with the shipped config every
        win_back before the char decoder is 0 so n_final == t always).

        Encoder lookahead (win_back > 0) is EXACT here: front outputs
        waiting on lookahead sit in an ``enc_ring`` and are re-fed (the
        reference instead discards the encoder's unvalid tail, losing
        win_back frames per chunk — chunk_conformer_blocks.py:827-831).
        """
        c = self.cfg
        if wav_chunk.shape[-1] != c.chunk_samples and (
                wav_chunk.ndim != 3 or wav_chunk.shape[1] != c.chunk_samples):
            raise ValueError(
                f"picker_stream_step expects chunks of exactly "
                f"{c.chunk_samples} samples, got {wav_chunk.shape}")
        front_out, new_wav, new_sub = self.front.stream_call(
            wav_chunk, caches["wav"], caches["sub"])
        t_new = front_out.shape[1]
        x_e, skip_e, new_enc_ring, new_enc_ring_fill, n_final_e = \
            self._ring_feed(caches.get("enc_ring"),
                            caches.get("enc_ring_fill"), front_out,
                            c.encoder.lookahead)
        enc_out, new_enc_mha, new_enc_cnn, new_enc_fill = \
            self.encoder.stream_call(x_e, caches["enc_mha"],
                                     caches["enc_cnn"], caches["enc_fill"],
                                     skip_e)
        # encoder final region: slots [skip_e, t_new) of the first t_new
        enc_final = enc_out[:, :t_new]
        x, skip, new_ring, new_ring_fill, n_final = self._ring_feed(
            caches["ring"], caches["ring_fill"], enc_final,
            c.picker.lookahead, in_skip=t_new - n_final_e)
        pk_logits, pk_hidden, new_pk_mha, new_pk_cnn, new_pk_fill = \
            self.phone_picker.stream_call(
                x, caches["picker_mha"], caches["picker_cnn"],
                caches["picker_fill"], skip)
        # final outputs: positions [skip, len(x) - lookahead) == last
        # n_final of the first t_new slots
        pk_logits = pk_logits[:, :t_new]
        pk_hidden = pk_hidden[:, :t_new]
        new_caches = {
            "wav": new_wav, "sub": new_sub,
            "enc_mha": new_enc_mha, "enc_cnn": new_enc_cnn,
            "enc_fill": new_enc_fill,
            "picker_mha": new_pk_mha, "picker_cnn": new_pk_cnn,
            "picker_fill": new_pk_fill,
            "ring": new_ring, "ring_fill": new_ring_fill,
        }
        if c.encoder.lookahead > 0:
            new_caches["enc_ring"] = new_enc_ring
            new_caches["enc_ring_fill"] = new_enc_ring_fill
        return pk_logits, pk_hidden, n_final, new_caches

    def decoder_stream_step(self, picked: jnp.ndarray,
                            caches: Dict[str, jnp.ndarray]):
        """One char-decoder step (decoder_stream_predict :841-852).

        picked [B, s, d] REAL picked frames (the session buffers until s
        are available). Returns (char_logits [B, s, Vc], provisional
        [B, L, Vc], n_final [B], new caches): the LAST n_final logits of
        the s emitted are final — with combined helper+decoder lookahead
        L_h + L_d (L_* = num_blocks * win_back per stack), output lags
        that many picked frames behind input until the rings warm up.
        ``provisional`` holds lookahead-truncated logits for the L_d
        pending decoder-ring frames (the reference's "unvalid" live-text
        tail, test_chunk_asr.py:83-123) — they are re-emitted as final on
        a later step. Helper lookahead is exact via its own input ring
        (the reference has no streaming helper lookahead at all).
        """
        c = self.cfg
        s = picked.shape[1]
        x_h, skip_h, new_h_ring, new_h_ring_fill, n_final_h = \
            self._ring_feed(caches.get("helper_ring"),
                            caches.get("helper_ring_fill"), picked,
                            c.helper.lookahead)
        helper_out, new_h_mha, new_h_cnn, new_h_fill = \
            self.helper.stream_call(x_h, caches["helper_mha"],
                                    caches["helper_cnn"],
                                    caches["helper_fill"], skip_h)
        helper_final = helper_out[:, :s]
        x, skip, new_ring, new_ring_fill, n_final = self._ring_feed(
            caches["ring"], caches["ring_fill"], helper_final,
            c.decoder.lookahead, in_skip=s - n_final_h)
        logits, _, new_d_mha, new_d_cnn, new_d_fill = \
            self.decoder.stream_call(
                x, caches["dec_mha"], caches["dec_cnn"],
                caches["dec_fill"], skip)
        provisional = logits[:, s:]
        logits = logits[:, :s]
        new_caches = {
            "helper_mha": new_h_mha, "helper_cnn": new_h_cnn,
            "helper_fill": new_h_fill,
            "dec_mha": new_d_mha, "dec_cnn": new_d_cnn,
            "dec_fill": new_d_fill,
            "ring": new_ring, "ring_fill": new_ring_fill,
        }
        if c.helper.lookahead > 0:
            new_caches["helper_ring"] = new_h_ring
            new_caches["helper_ring_fill"] = new_h_ring_fill
        return logits, provisional, n_final, new_caches


    def _fused_decoder_phase(self, hidden: jnp.ndarray, keep: jnp.ndarray,
                             dec: Dict[str, jnp.ndarray]):
        """Vectorized decoder phase: one batched helper+decoder pass over
        the whole chunk instead of ``t`` sequential micro-steps (the
        profiled ~2.3 ms / ~180-kernel bottleneck of the serving tick,
        docs/serving_tick_profile.md #4). Kept frames stay at their
        original positions (``keep`` [B, t]); rings advance by
        compacting gathers (``ring_append_dyn``) so per-stream-variable
        pick counts never put garbage between real rows; attention is
        real-index banded. State evolution and outputs are mathematically
        identical to the sequential path — verified token-exact and
        allclose-on-caches by tests/test_chunk_fused_decoder.py — but not
        bit-identical (different matmul batching), so this is an opt-in
        serving path (``model_config.fused_decoder: true``), off for the
        CPU exact-parity suite.

        Returns (char_ids [B, t] aligned to frame positions (-1 where no
        final char), prov_ids [B, max(wb, 1)], new decoder caches).
        """
        c = self.cfg
        if c.helper.lookahead:
            raise ValueError(
                "fused_decoder supports helper win_back == 0 only (the "
                "shipped config); use the sequential path for helper "
                "lookahead")
        wb = c.decoder.lookahead
        b, t = keep.shape
        n = jnp.sum(keep, axis=1).astype(jnp.int32)

        h_out, new_h_mha, new_h_cnn, new_h_fill = self.helper.stream_call_dyn(
            hidden.astype(jnp.float32), dec["helper_mha"],
            dec["helper_cnn"], dec["helper_fill"], keep, keep)

        ring, rf = dec["ring"], jnp.minimum(
            dec["ring_fill"].astype(jnp.int32), wb)
        x_d = jnp.concatenate([ring, h_out.astype(ring.dtype)], axis=1)
        ring_valid = jnp.arange(wb)[None, :] >= (wb - rf[:, None])
        row_valid_d = jnp.concatenate([ring_valid, keep], axis=1)
        n_adv = jnp.maximum(rf + n - wb, 0)
        rank_d = jnp.cumsum(row_valid_d.astype(jnp.int32), axis=1) - 1
        adv_mask = row_valid_d & (rank_d < n_adv[:, None])

        logits, _, new_d_mha, new_d_cnn, new_d_fill = \
            self.decoder.stream_call_dyn(
                x_d, dec["dec_mha"], dec["dec_cnn"], dec["dec_fill"],
                row_valid_d, adv_mask)

        lc_d = left_compact_idx(row_valid_d)           # reals in order
        # final chars: the first n_adv real rows exit with full lookahead
        final_pos = lc_d[:, :t]
        final_ids = jnp.argmax(jnp.take_along_axis(
            logits, final_pos[..., None], axis=1), -1).astype(jnp.int32)
        # re-align the k-th emission to the frame whose push triggered it
        # (sequential parity): kept frame with kept-rank >= wb - rf emits
        # emission #(rank - wb + rf)
        k_rank = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
        emit_idx = jnp.clip(k_rank - wb + rf[:, None], 0, t - 1)
        emits = keep & (k_rank >= (wb - rf)[:, None])
        char_ids = jnp.where(
            emits, jnp.take_along_axis(final_ids, emit_idx, axis=1), -1)

        # pending ring: last min(rf + n, wb) reals of [ring ++ kept rows]
        kept_rows = jnp.take_along_axis(
            h_out.astype(ring.dtype), left_compact_idx(keep)[..., None],
            axis=1)
        new_ring = ring_append_dyn(ring, kept_rows, n)
        new_rf = jnp.minimum(rf + n, wb)

        # provisional: the pending reals' lookahead-truncated outputs,
        # right-aligned like the sequential prov (all -1 when nothing was
        # pushed this step)
        if wb > 0:
            pend_rank = n_adv[:, None] + jnp.arange(wb)[None, :]
            pend_pos = jnp.take_along_axis(
                lc_d, jnp.clip(pend_rank, 0, wb + t - 1), axis=1)
            pend_ids = jnp.argmax(jnp.take_along_axis(
                logits, pend_pos[..., None], axis=1), -1).astype(jnp.int32)
            slot = jnp.arange(wb)[None, :]
            slot_valid = slot >= (wb - new_rf[:, None])
            src = jnp.clip(slot - (wb - new_rf)[:, None], 0, wb - 1)
            prov_ids = jnp.where(
                slot_valid & (n > 0)[:, None],
                jnp.take_along_axis(pend_ids, src, axis=1), -1)
        else:
            prov_ids = jnp.full((b, 1), -1, jnp.int32)

        new_dec = {
            "helper_mha": new_h_mha, "helper_cnn": new_h_cnn,
            "helper_fill": new_h_fill,
            "dec_mha": new_d_mha, "dec_cnn": new_d_cnn,
            "dec_fill": new_d_fill,
            "ring": new_ring,
            "ring_fill": new_rf.astype(dec["ring_fill"].dtype),
        }
        return char_ids, prov_ids, new_dec

    # -- fully fused streaming ---------------------------------------------
    def init_stream_caches(self, batch: int) -> Dict[str, jnp.ndarray]:
        caches = dict(self.init_picker_caches(batch))
        for k, v in self.init_decoder_caches(batch).items():
            caches[f"dec_{k}"] = v
        return caches

    def fused_stream_step(self, wav_chunk: jnp.ndarray,
                          caches: Dict[str, jnp.ndarray]):
        """One WHOLE streaming step as a single program: picker + feature
        pick + (conditional) char-decoder advance for every new encoder
        frame. The per-frame decoder runs unconditionally (sub_length tiny
        s=1 steps per chunk) and its cache update is SELECTED by the
        pick mask — compute-and-discard keeps shapes static while the
        state stays exactly equal to the host-FIFO design.

        Batch must be 1 (per-stream state machine). Returns
        (phone_ids [t], char_ids [t] (-1 where no final char emitted),
        prov_ids [wb] (-1 padded), n_final [1], new caches).
        """
        t = self.cfg.sub_length
        wb = self.cfg.decoder.lookahead
        pk_keys = ["wav", "sub", "enc_mha", "enc_cnn", "enc_fill",
                   "picker_mha", "picker_cnn", "picker_fill", "ring",
                   "ring_fill"]
        if self.cfg.encoder.lookahead > 0:
            pk_keys += ["enc_ring", "enc_ring_fill"]
        pk_caches = {k: caches[k] for k in pk_keys}
        dec_caches = {k[len("dec_"):]: v for k, v in caches.items()
                      if k.startswith("dec_")}
        logits, hidden, n_final, new_pk = self.picker_stream_step(
            wav_chunk, pk_caches)
        phone_ids = jnp.argmax(logits[0], -1).astype(jnp.int32)     # [t]
        f_idx = jnp.arange(t)
        valid = f_idx >= (t - n_final[0])
        keep = (phone_ids != self.phone_blank) & valid

        if self.cfg.fused_decoder:
            char_ids_b, prov_ids_b, new_dec = self._fused_decoder_phase(
                hidden, keep[None], dec_caches)
            out_caches = dict(new_pk)
            for k, v in new_dec.items():
                out_caches[f"dec_{k}"] = v
            return (phone_ids, char_ids_b[0], prov_ids_b[0], n_final,
                    out_caches)

        prov_init = jnp.full((max(wb, 1),), -1, jnp.int32)

        # lax.scan over the t decoder micro-steps (was a Python unroll —
        # trace size grew with chunk_num/reduction_factor; scan keeps the
        # program one body regardless, round-1 weak item 5)
        def micro_step(mdl, carry, xs):
            dec_c, prov = carry
            x_f, keep_f = xs                     # [1, 1, d], scalar bool
            lg, pv, nf, new_dec = mdl.decoder_stream_step(x_f, dec_c)
            emit = keep_f & (nf[0] > 0)
            char_id = jnp.where(
                emit, jnp.argmax(lg[0, 0], -1).astype(jnp.int32), -1)
            if wb > 0:
                fill = new_dec["ring_fill"][0]
                p = jnp.argmax(pv[0], -1).astype(jnp.int32)
                slot_valid = jnp.arange(wb) >= (wb - fill)
                prov = jnp.where(keep_f, jnp.where(slot_valid, p, -1),
                                 prov)
            dec_c = jax.tree.map(
                lambda new, old: jnp.where(keep_f, new, old),
                new_dec, dec_c)
            return (dec_c, prov), char_id

        # NOTE: unrolling this scan (unroll=t) and the layer scans
        # (scan_unroll) were both measured SLOWER at S=256 — XLA's
        # fusion degrades across unrolled bodies (tools/profile_tick.py,
        # docs/serving_tick_profile.md); keep plain scans
        scan = nn.scan(micro_step,
                       variable_broadcast=("params", "batch_stats"),
                       split_rngs={"params": False, "dropout": False},
                       in_axes=0, out_axes=0)
        xs = (jnp.moveaxis(hidden[:, :, None], 1, 0), keep)  # [t, 1, 1, d]
        (dec_caches, prov_ids), char_ids = scan(
            self, (dec_caches, prov_init), xs)

        out_caches = dict(new_pk)
        for k, v in dec_caches.items():
            out_caches[f"dec_{k}"] = v
        return phone_ids, char_ids, prov_ids, n_final, out_caches

    # -- multi-stream (vmapped) serving ------------------------------------
    def init_multi_stream_caches(self, n_streams: int):
        """Stream-state pool for ``batched_stream_step``: every leaf of the
        single-stream cache pytree gains a leading [n_streams] slot axis.
        All stream state is zeros at init (cold start == offline padding,
        see module docstring), so this is a plain zeros tree."""
        one = self.init_stream_caches(1)
        return jax.tree.map(
            lambda x: jnp.zeros((n_streams,) + x.shape, x.dtype), one)

    def batched_stream_step(self, wav_chunks: jnp.ndarray, caches,
                            reset: jnp.ndarray | None = None,
                            advance: jnp.ndarray | None = None):
        """Advance ``n_streams`` independent per-stream state machines in
        ONE program: ``fused_stream_step`` vmapped over a slot axis, params
        broadcast. This is the many-concurrent-streams serving form — the
        reference serves one stream per CPU core (RTF 0.1, README.md:172);
        one TPU chip instead runs every slot's 160 ms chunk in a single
        batched dispatch.

        wav_chunks [S, chunk_samples]; caches from
        ``init_multi_stream_caches(S)``.
        reset   [S] bool: slots whose stream state is zeroed BEFORE the
                step (stream open / slot reuse).
        advance [S] bool: slots whose state actually moves; a False slot
                keeps its (post-reset) state unchanged and its outputs for
                this step are meaningless. Lets a server tick a full slot
                pool when only some slots have a complete chunk buffered.

        Returns (phone_ids [S, t], char_ids [S, t], prov_ids [S, wb],
        n_final [S, 1], new caches).
        """
        if reset is not None:
            caches = jax.tree.map(
                lambda x: jnp.where(
                    reset.reshape((-1,) + (1,) * (x.ndim - 1)),
                    jnp.zeros((), x.dtype), x),
                caches)
        vstep = nn.vmap(
            ChunkConformer.fused_stream_step,
            in_axes=(0, 0), out_axes=0,
            variable_axes={"params": None, "batch_stats": None},
            split_rngs={"params": False, "dropout": False})
        phone_ids, char_ids, prov_ids, n_final, new_caches = vstep(
            self, wav_chunks[:, None, :], caches)
        if advance is not None:
            new_caches = jax.tree.map(
                lambda new, old: jnp.where(
                    advance.reshape((-1,) + (1,) * (new.ndim - 1)),
                    new, old),
                new_caches, caches)
        return phone_ids, char_ids, prov_ids, n_final, new_caches


from tensorflowasr_tpu.models.conformer import count_params  # noqa: E402,F401
