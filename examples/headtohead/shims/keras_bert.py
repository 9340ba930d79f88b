"""keras_bert shim (examples/headtohead): the surface the reference's
punc dataloader uses (punc_recover/dataloaders/punc_dataloader.py:5,
22-24, 121-168) — vocab load, char tokenizer, and a 'BERT' whose
predict() returns the SAME deterministic pseudo-teacher features
(pseudo_bert.py) our side distills toward.  No real BERT weights exist
in this environment; both frameworks share this teacher."""

from __future__ import annotations

import numpy as np

from pseudo_bert import embedding_matrix


def load_vocabulary(path):
    from pseudo_bert import load_vocab
    return load_vocab(path)


class Tokenizer:
    def __init__(self, vocab):
        self.vocab = vocab
        self.unk = vocab["[UNK]"]

    def encode(self, text, second=None, max_len=None):
        ids = ([self.vocab["[CLS]"]]
               + [self.vocab.get(c, self.unk) for c in text]
               + [self.vocab["[SEP]"]])
        return ids, [0] * len(ids)


class _PseudoBert:
    def __init__(self, vocab_size):
        self.E = embedding_matrix(vocab_size)

    def predict(self, inputs, **kwargs):
        tokens = np.asarray(inputs[0], np.int64)
        return self.E[np.clip(tokens, 0, len(self.E) - 1)].copy()


def load_trained_model_from_checkpoint(config_json, checkpoint,
                                       trainable=False, seq_len=None,
                                       **kwargs):
    # vocab size = line count of the vocab file named in config_json's
    # sibling vocab.txt is unknown here; derive it from the config json
    # if present, else fall back to a generous bound (ids are clipped)
    import json
    import os

    size = 65536
    try:
        with open(config_json) as f:
            size = int(json.load(f).get("vocab_size", size))
    except Exception:
        pass
    return _PseudoBert(size)
