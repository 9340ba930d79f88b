"""TPU-native audio frontend: framed-DFT log-mel spectrogram.

Re-designs the reference's conv-DFT Spectrogram/Melspectrogram layers
(asr/models/layers/time_frequency.py:7-202, backend.py:27-69,
backend_keras.py:5-37 in Z-yq/TensorflowASR) as XLA-friendly matmuls:

    wav [B, T]
      -> frame (hop-sized blocks + shifted slices; contiguous copies, no
         gather — see frame_signal_blocks)
      -> windowed DFT as ONE [n_fft, 2*(n_fft//2+1)] matmul on the MXU
      -> power  = re^2 + im^2
      -> dB     ('same':  10*log10, per-sample max-normalized, floor -80;
                 'valid': plain log10 — the chunk/streaming variant)
      -> Slaney mel matmul [n_freq, n_mels]

Exact semantic parity notes (verified against the reference):
- Hann window is periodic (fftbins=True).
- 'same' padding matches Keras conv 'same' for stride=hop (out=ceil(T/hop)).
- 'valid' padding left-pads n_fft-1 zeros first (causal; out=ceil(T/hop))
  (time_frequency.py:107-110).
- dB is applied to the POWER SPECTROGRAM and the mel matmul is applied to
  the dB values (Melspectrogram.call: super().call already returns
  decibels because return_decibel_spectrogram defaults True and the
  mel-level dB is commented out — time_frequency.py:173-189).
- Mel basis is librosa Slaney (htk=False, norm=1 area normalization).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side (numpy) constant builders
# ---------------------------------------------------------------------------

def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    """Hann window; periodic matches scipy get_window('hann', n, fftbins=True)."""
    denom = n if periodic else n - 1
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / denom)).astype(
        np.float32)


def stft_kernels(n_fft: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real/imag DFT matrices, each [n_fft, n_fft//2 + 1]."""
    n_freq = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]            # [n_fft, 1]
    w = np.arange(n_freq)[None, :] * 2.0 * np.pi / n_fft  # [1, n_freq]
    real = np.cos(t * w)
    imag = -np.sin(t * w)
    win = hann_window(n_fft)[:, None]
    return (real * win).astype(np.float32), (imag * win).astype(np.float32)


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = f >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
                    / logstep, mels)
    return mels


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = m >= min_log_mel
    return np.where(log_t, min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_frequencies(n_mels: int, fmin: float, fmax: float,
                    htk: bool = False) -> np.ndarray:
    if htk:
        mels = np.linspace(_hz_to_mel_htk(fmin), _hz_to_mel_htk(fmax), n_mels)
        return _mel_to_hz_htk(mels)
    mels = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), n_mels)
    return _mel_to_hz_slaney(mels)


def mel_filterbank(sr: int, n_fft: int, n_mels: int = 80,
                   fmin: float = 0.0, fmax: Optional[float] = None,
                   htk: bool = False, norm: Optional[int] = 1) -> np.ndarray:
    """Slaney-style triangular mel filterbank, shape [n_fft//2+1, n_mels].

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax, htk, norm=1)
    transposed (the reference stores it as freq2mel — time_frequency.py:160).
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freq = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freq)
    mel_f = mel_frequencies(n_mels + 2, fmin, fmax, htk=htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]   # [n_mels+2, n_freq]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # [n_mels, n_freq]

    if norm == 1 or norm == "slaney":
        enorm = 2.0 / (mel_f[2: n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    return weights.T.astype(np.float32)         # [n_freq, n_mels]


# ---------------------------------------------------------------------------
# Device-side ops
# ---------------------------------------------------------------------------

def _same_pad(t: int, k: int, s: int) -> Tuple[int, int]:
    """Keras/TF conv 'same' padding amounts for length t, kernel k, stride s."""
    out = -(-t // s)
    pad = max((out - 1) * s + k - t, 0)
    return pad // 2, pad - pad // 2


def wav_to_float(wav: jnp.ndarray) -> jnp.ndarray:
    """int16 PCM [B, T] -> float32 in [-1, 1); float input passes through.

    Dataloaders ship wav batches as int16 (the augmentation pipeline
    int16-quantizes every sample anyway, augment.py int16 parity), which
    halves host->device transfer — significant when the chip is remote.
    Models dequantize here, at the first in-graph touch."""
    if wav.dtype == jnp.int16:
        return wav.astype(jnp.float32) / 32768.0
    return wav


def frame_signal_blocks(wav: jnp.ndarray, n_fft: int, hop: int,
                        padding: str = "same") -> jnp.ndarray:
    """[B, T] -> [B, n_frames, ceil(n_fft/hop)*hop] hop-strided frames.

    'same': centered zero-padding, n_frames = ceil(T / hop).
    'valid': left-pad n_fft-1 (causal; frame i ends at sample i*hop),
             n_frames = ceil(T / hop) — the chunk-streaming variant.

    Implementation: the padded signal is reshaped into NON-overlapping
    hop-sized blocks and frame rows are assembled from ceil(n_fft/hop)
    shifted block slices — large contiguous copies instead of
    ``conv_general_dilated_patches``'s per-element gather lowering
    (measured 8.9 ms -> ~2 ms for the [128, 8 s] frontend on TPU v5e).

    The trailing ``ceil(n_fft/hop)*hop - n_fft`` columns of each frame are
    arbitrary padding: contract them against a zero-padded kernel (what
    :func:`power_spectrogram` does) or slice them off
    (:func:`frame_signal`).
    """
    if wav.ndim != 2:
        raise ValueError(f"expected [B, T], got {wav.shape}")
    b, t = wav.shape
    out = -(-t // hop)
    if padding == "same":
        lo, hi = _same_pad(t, n_fft, hop)
    elif padding == "valid":
        lo, hi = n_fft - 1, 0
    else:
        raise ValueError(padding)
    n_chunks = -(-n_fft // hop)
    padded_len = lo + t + hi
    nb = out - 1 + n_chunks + 1
    total = nb * hop
    wavp = jnp.pad(wav, ((0, 0), (lo, max(0, total - padded_len) + hi)))
    wavp = wavp[:, :total]
    blocks = wavp.reshape(b, nb, hop)
    shifts = [blocks[:, j:j + out] for j in range(n_chunks)]
    return jnp.stack(shifts, axis=2).reshape(b, out, n_chunks * hop)


def frame_signal(wav: jnp.ndarray, n_fft: int, hop: int,
                 padding: str = "same") -> jnp.ndarray:
    """[B, T] -> [B, n_frames, n_fft] hop-strided frames (see
    :func:`frame_signal_blocks` for the padding semantics and the
    TPU-friendly lowering)."""
    return frame_signal_blocks(wav, n_fft, hop, padding)[:, :, :n_fft]


@dataclasses.dataclass(frozen=True)
class LogMelFrontendConfig:
    sample_rate: int = 16000
    n_fft: int = 1024
    stride_ms: int = 10
    n_mels: int = 80
    fmin: float = 0.0
    fmax: Optional[float] = None
    padding: str = "same"          # 'same' (offline) | 'valid' (chunk/causal)
    dynamic_range_db: float = 80.0

    @property
    def hop(self) -> int:
        return self.sample_rate * self.stride_ms // 1000

    @property
    def n_freq(self) -> int:
        return self.n_fft // 2 + 1


@functools.lru_cache(maxsize=8)
def _frontend_constants(cfg: LogMelFrontendConfig):
    """Host numpy constants ONLY — caching device arrays here would leak
    tracers when first touched inside a jit trace."""
    real, imag = stft_kernels(cfg.n_fft)
    dft = np.concatenate([real, imag], axis=1)            # [n_fft, 2*n_freq]
    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                        cfg.fmin, cfg.fmax)
    return dft, fb


@functools.lru_cache(maxsize=8)
def _padded_dft(cfg: LogMelFrontendConfig):
    """DFT kernel zero-padded to the block-framing row count
    (ceil(n_fft/hop)*hop) so frames need no trailing slice — the zero rows
    contribute exactly nothing in any matmul precision."""
    dft, _ = _frontend_constants(cfg)
    kpad = -(-cfg.n_fft // cfg.hop) * cfg.hop
    return np.pad(dft, ((0, kpad - cfg.n_fft), (0, 0)))


def power_spectrogram(wav: jnp.ndarray, cfg: LogMelFrontendConfig
                      ) -> jnp.ndarray:
    """[B, T] -> [B, n_frames, n_freq] power spectrum via one MXU matmul."""
    dft = jnp.asarray(_padded_dft(cfg))
    frames = frame_signal_blocks(wav.astype(jnp.float32), cfg.n_fft,
                                 cfg.hop, cfg.padding)
    # HIGH (3-pass bf16 emulation) not HIGHEST (6-pass): measured on
    # TPU v5e at B=128/8s the mel output differs by <6e-4 dB while the
    # frontend drops from 15.4 ms to 11.9 ms
    spec = jnp.einsum("btn,nf->btf", frames, dft,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGH)
    re, im = jnp.split(spec, 2, axis=-1)
    return re * re + im * im


def amplitude_to_db(x: jnp.ndarray, amin: float = 1e-10,
                    dynamic_range: float = 80.0) -> jnp.ndarray:
    """10*log10 with per-sample max normalization to [-range, 0].

    Parity: backend_keras.amplitude_to_decibel (backend_keras.py:5-23);
    the max is over all non-batch axes.
    """
    log_spec = 10.0 * jnp.log(jnp.maximum(x, amin)) / np.log(10.0)
    axes = tuple(range(1, x.ndim))
    log_spec = log_spec - jnp.max(log_spec, axis=axes, keepdims=True)
    return jnp.maximum(log_spec, -dynamic_range)


def chunk_amplitude_to_db(x: jnp.ndarray, amin: float = 1e-10) -> jnp.ndarray:
    """Plain log10 without normalization — streaming/causal variant
    (backend_keras.py:25-37): chunk-wise max-norm would break causality."""
    return jnp.log(jnp.maximum(x, amin)) / np.log(10.0)


def log_mel_spectrogram(wav: jnp.ndarray, cfg: LogMelFrontendConfig,
                        mel_weights: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """[B, T] -> [B, n_frames, n_mels] log-mel features.

    NOTE (parity): dB is applied to the power spectrogram FIRST and the mel
    matmul mixes dB values (time_frequency.py:173-189 — Spectrogram returns
    decibels, Melspectrogram matmuls them with freq2mel).

    ``mel_weights`` overrides the fixed Slaney basis — pass a learnable
    parameter for the trainable_fb variant.
    """
    _, fb = _frontend_constants(cfg)
    fb = jnp.asarray(fb)
    if mel_weights is not None:
        fb = mel_weights
    power = power_spectrogram(wav, cfg)
    if cfg.padding == "valid":
        db = chunk_amplitude_to_db(power)
    else:
        db = amplitude_to_db(power, dynamic_range=cfg.dynamic_range_db)
    return jnp.einsum("btf,fm->btm", db, fb,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGH)


def spectrogram_feature(wav: jnp.ndarray, cfg: LogMelFrontendConfig
                        ) -> jnp.ndarray:
    """Plain (non-mel) dB spectrogram feature — the reference's
    ``mel_layer_type: Spectrogram`` option (conformer_blocks.py:319-324)."""
    power = power_spectrogram(wav, cfg)
    if cfg.padding == "valid":
        return chunk_amplitude_to_db(power)
    return amplitude_to_db(power, dynamic_range=cfg.dynamic_range_db)
