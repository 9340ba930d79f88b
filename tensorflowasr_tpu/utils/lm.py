"""Token-bigram language model for shallow fusion.

The reference's beam decoder scores prefixes with a KenLM word model
(externals/ctc_decoders.zip scorer.cpp). On TPU the LM must live on-chip
as a tensor: this module estimates an add-k smoothed token-bigram table
``lm_logp[prev, cur]`` from training transcripts, saved/loaded as .npz,
consumed by ``ops.beam.ctc_beam_search_decode(lm_logp=..., lm_weight=...)``.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np


def estimate_bigram_lm(id_sequences: Iterable[Sequence[int]],
                       vocab_size: int, add_k: float = 0.5) -> np.ndarray:
    """[V, V] log p(cur | prev) with add-k smoothing; row 0 doubles as the
    sentence-start context (pad/start id 0)."""
    counts = np.full((vocab_size, vocab_size), add_k, np.float64)
    for seq in id_sequences:
        prev = 0
        for tok in seq:
            counts[prev, int(tok)] += 1.0
            prev = int(tok)
    probs = counts / counts.sum(axis=1, keepdims=True)
    return np.log(probs).astype(np.float32)


def save_lm(path: str, lm_logp: np.ndarray) -> None:
    np.savez_compressed(path, lm_logp=lm_logp)


def load_lm(path: str) -> np.ndarray:
    return np.load(path)["lm_logp"]


def perplexity(lm_logp: np.ndarray, id_sequences: Iterable[Sequence[int]]
               ) -> float:
    total, n = 0.0, 0
    for seq in id_sequences:
        prev = 0
        for tok in seq:
            total += float(lm_logp[prev, int(tok)])
            prev = int(tok)
            n += 1
    return float(np.exp(-total / max(n, 1)))
