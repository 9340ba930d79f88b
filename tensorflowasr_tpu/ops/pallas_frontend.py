"""Pallas TPU kernel: fused framing + windowed DFT power spectrogram.

STATUS / measured reality (TPU v5e, B=128 x 8 s, scalar-fetch timing —
the round-1 "XLA is 8x faster" comparison was a tunnel timing artifact):
this kernel runs the power spectrogram in 8.1 ms vs 10.0 ms for the XLA
block-framing path (ops/frontend.py frame_signal_blocks) — but at
default MXU precision (single bf16 pass, max mel-dB error 0.14 vs
Precision.HIGHEST) while the XLA path runs 3-pass bf16 emulation (error
0.0007). At matched precision the 3x matmul cost erases the lead, and
fusing the dB+mel epilogue in-kernel would break the reference's
max-normalize-then-floor dB parity (per-example GLOBAL max — needs two
passes). The XLA path therefore remains the default; this module is the
tested Pallas formulation of the framing problem (the shifted-matmul
decomposition below is the building block for streaming-frontend fusions
where XLA cannot fuse across the cache boundary).

Design:

The wav is reshaped host-side into hop-sized rows [B, R, hop]. A frame of
``n_fft`` samples starting at row f is the concatenation of rows
f .. f+C-1 (C = ceil(n_fft / hop); the DFT matrix is zero-padded to C*hop
rows), so the windowed DFT factorizes into C SHIFTED, fully aligned
matmuls:

    spec[f, :] = sum_r  wavR[f + r, :] @ dft[r*hop : (r+1)*hop, :]

Each grid program DMAs its (tile_f + C) row slab from HBM, runs C
[tile_f, hop] x [hop, 2*n_freq] MXU matmuls (static sublane shifts — no
unaligned lane slicing, which Mosaic cannot lower), and writes the
[tile_f, n_freq] power block. dB scaling and the mel matmul stay in XLA
(the offline dB variant needs a per-example global max; the spectrogram
is ~8x smaller than the frames the XLA path spills).

``interpret=True`` runs the same kernel on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tensorflowasr_tpu.ops import frontend as fe


def _kernel(wav_hbm, dft_ref, out_ref, slab_ref, sem, *, tile_f: int,
            hop: int, n_chunks: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    rows = tile_f + ((n_chunks + 7) // 8) * 8   # 8-aligned DMA slice
    dma = pltpu.make_async_copy(
        wav_hbm.at[i, pl.ds(j * tile_f, rows), :],
        slab_ref,
        sem,
    )
    dma.start()
    dma.wait()
    acc = jnp.zeros_like(out_ref[0], shape=(tile_f, dft_ref.shape[-1]))
    for r in range(n_chunks):
        acc = acc + jnp.dot(
            slab_ref[r:r + tile_f, :],
            dft_ref[r, :, :],
            preferred_element_type=jnp.float32,
        )
    n_freq = acc.shape[-1] // 2
    re = acc[:, :n_freq]
    im = acc[:, n_freq:]
    out_ref[0, :, :] = re * re + im * im


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "tile_f"))
def power_spectrogram_pallas(wav: jnp.ndarray, cfg: fe.LogMelFrontendConfig,
                             interpret: bool = False,
                             tile_f: int = 128) -> jnp.ndarray:
    """[B, T] -> [B, n_frames, n_freq] power spectrum (fused kernel)."""
    n_fft, hop = cfg.n_fft, cfg.hop
    b, t = wav.shape
    if cfg.padding == "same":
        lo, hi = fe._same_pad(t, n_fft, hop)
    elif cfg.padding == "valid":
        lo, hi = n_fft - 1, 0
    else:
        raise ValueError(cfg.padding)
    n_frames = -(-t // hop)
    n_tiles = -(-n_frames // tile_f)
    n_chunks = -(-n_fft // hop)
    pad_rows = ((n_chunks + 7) // 8) * 8
    rows_needed = n_tiles * tile_f + pad_rows
    total = rows_needed * hop
    wav_p = jnp.pad(wav.astype(jnp.float32),
                    ((0, 0), (lo, max(0, total - (t + lo)))))
    # lane dim must be 128-aligned for Mosaic DMA slices: pad each hop row
    hop_pad = ((hop + 127) // 128) * 128
    wav_rows = wav_p[:, :total].reshape(b, rows_needed, hop)
    if hop_pad != hop:
        wav_rows = jnp.pad(wav_rows, ((0, 0), (0, 0), (0, hop_pad - hop)))

    dft_np, _ = fe._frontend_constants(cfg)           # [n_fft, 2*n_freq]
    n_freq = cfg.n_freq
    flat = np.zeros((n_chunks * hop, 2 * n_freq), np.float32)
    flat[:n_fft] = dft_np
    dft7 = np.zeros((n_chunks, hop_pad, 2 * n_freq), np.float32)
    dft7[:, :hop, :] = flat.reshape(n_chunks, hop, 2 * n_freq)
    dft7 = jnp.asarray(dft7)

    out = pl.pallas_call(
        functools.partial(_kernel, tile_f=tile_f, hop=hop,
                          n_chunks=n_chunks),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile_f, n_freq),
                                       jnp.float32),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # wav rows (HBM)
            pl.BlockSpec((n_chunks, hop_pad, 2 * n_freq),
                         lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_f, n_freq),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_f + ((n_chunks + 7) // 8) * 8, hop_pad),
                       jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(wav_rows, dft7)
    return out[:, :n_frames]


def log_mel_spectrogram_pallas(wav: jnp.ndarray,
                               cfg: fe.LogMelFrontendConfig,
                               mel_weights: Optional[jnp.ndarray] = None,
                               interpret: bool = False) -> jnp.ndarray:
    """Fused-kernel variant of frontend.log_mel_spectrogram (same
    semantics: dB on power first, then the mel matmul)."""
    _, fb = fe._frontend_constants(cfg)
    fb = jnp.asarray(fb) if mel_weights is None else mel_weights
    power = power_spectrogram_pallas(wav, cfg, interpret=interpret)
    if cfg.padding == "valid":
        db = fe.chunk_amplitude_to_db(power)
    else:
        db = fe.amplitude_to_db(power, dynamic_range=cfg.dynamic_range_db)
    return jnp.einsum("btf,fm->btm", db, fb,
                      preferred_element_type=jnp.float32)
