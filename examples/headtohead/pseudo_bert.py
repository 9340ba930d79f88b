"""Deterministic pseudo-BERT teacher shared by BOTH head-to-head punc
runs.

The reference's punc dataloader hard-requires a keras-bert Chinese BERT
checkpoint at train time (punc_recover/dataloaders/punc_dataloader.py:
22-24, 76-83) and distills hidden features into the student with weight
10 (punc_trainer.py:59-60). No BERT weights can ship in this
environment, so the head-to-head replaces the teacher on BOTH sides with
the same deterministic embedding-lookup features: a fixed seeded matrix
E [vocab, 768]; feature(line) = E[[CLS] c1..cn [SEP]]. Identical targets
for both frameworks -> the distillation term stays active and fair while
the discriminating signal remains the punctuation CE branch.
"""

from __future__ import annotations

import hashlib

import numpy as np

DIM = 768
SEED = 20260820


def load_vocab(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        return {line.rstrip("\n"): i for i, line in enumerate(f)
                if line.strip()}


def embedding_matrix(vocab_size: int) -> np.ndarray:
    rng = np.random.default_rng(SEED)
    return (rng.standard_normal((vocab_size, DIM)) * 0.1).astype(np.float32)


def encode(text: str, vocab: dict) -> list:
    unk = vocab["[UNK]"]
    return ([vocab["[CLS]"]] + [vocab.get(c, unk) for c in text]
            + [vocab["[SEP]"]])


def write_features_for_ours(lines, vocab_path: str, bd_tokens, out_dir: str):
    """Precompute per-line .npy teacher features in the layout OUR punc
    dataloader loads back (data/punc_dataloader.py:122-126: sha1 of the
    PUNCTUATED line; array [n_chars + 2, 768] for the de-punctuated
    chars)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    vocab = load_vocab(vocab_path)
    E = embedding_matrix(len(vocab))
    bd = set(bd_tokens)
    for line in lines:
        line = line.strip()
        if not line:
            continue
        chars = "".join(c for c in line if c not in bd)
        feat = E[np.asarray(encode(chars, vocab))]
        h = hashlib.sha1(line.encode("utf-8")).hexdigest()[:16]
        np.save(os.path.join(out_dir, f"{h}.npy"), feat)
