"""Chunk-streaming (SMLTA2) serving session.

Host-side driver for ChunkConformer streaming (the reference's
test_chunk_asr.py stream_call loop, :57-123). The whole per-chunk update —
front + encoder + phone picker + feature pick + char-decoder advance for
every picked frame — is ONE fused jitted program
(``ChunkConformer.fused_stream_step``): all streaming state lives on the
device, and the host does exactly one dispatch + one packed fetch per
160 ms chunk (critical when the accelerator is remote; the naive
host-FIFO design cost 3-6 round trips per chunk).

Equivalent to running the two-step picker/decoder API with
decoder_step=1 — streaming output is exactly the offline decode
(tested in tests/test_chunk_session.py).

Measured on one TPU v5e behind a network tunnel (full 15-block config,
160 ms chunks): ~33 ms per chunk -> per-stream RTF 0.21, of which ~30 ms
is tunnel round-trip latency and ~4 ms is compute — a colocated chip runs
at RTF ~0.03 (reference baseline: 0.1 on one CPU core). The naive design
with host-side picking cost 3-6 round trips per chunk (RTF 4.4 -> 1.5 ->
0.21 across the three designs).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.models.chunk_conformer import ChunkConformer


class ChunkStreamSession:
    def __init__(self, model: ChunkConformer, variables: dict,
                 phone_featurizer=None, text_featurizer=None):
        self.model = model
        self.variables = variables
        self.cfg = model.cfg
        self.phone_featurizer = phone_featurizer
        self.text_featurizer = text_featurizer
        self.phone_blank = model.num_phone_classes - 1
        self.char_blank = model.num_char_classes - 1
        t = self.cfg.sub_length
        wb = max(self.cfg.decoder.lookahead, 1)

        def step(v, chunk, caches):
            phone_ids, char_ids, prov_ids, n_final, new = model.apply(
                v, chunk, caches, method=ChunkConformer.fused_stream_step)
            packed = jnp.concatenate([
                phone_ids.astype(jnp.float32),
                char_ids.astype(jnp.float32),
                prov_ids.astype(jnp.float32),
                n_final.astype(jnp.float32),
            ])                                    # [t + t + wb + 1]
            return packed, new

        self._step = jax.jit(step)
        self._t = t
        self._wb = wb
        self.reset()

    def reset(self):
        self.caches = self.model.apply(
            self.variables, 1, method=ChunkConformer.init_stream_caches)
        self._wav_rem = np.zeros((0,), np.float32)
        self._char_ids: List[int] = []
        self._provisional_ids: List[int] = []
        self._phone_ids: List[int] = []

    # -- feeding ------------------------------------------------------------
    def feed(self, wav: np.ndarray) -> dict:
        """Feed arbitrary-length float32 audio; processes every complete
        chunk; returns the live result dict."""
        self._wav_rem = np.concatenate([self._wav_rem,
                                        np.asarray(wav, np.float32)])
        cs = self.cfg.chunk_samples
        while len(self._wav_rem) >= cs:
            self._process_chunk(self._wav_rem[:cs])
            self._wav_rem = self._wav_rem[cs:]
        return self.result()

    def flush(self) -> dict:
        """End of stream: zero-pad residual audio to one chunk. Picked
        frames still in the decoder lookahead ring are reported through
        the provisional ids (the reference ends streams on provisional
        text too — live decode of valid+unvalid)."""
        if len(self._wav_rem) > 0:
            cs = self.cfg.chunk_samples
            chunk = np.zeros((cs,), np.float32)
            chunk[:len(self._wav_rem)] = self._wav_rem
            self._wav_rem = np.zeros((0,), np.float32)
            self._process_chunk(chunk)
        return self.result()

    # -- internals ----------------------------------------------------------
    def _process_chunk(self, chunk: np.ndarray):
        packed, self.caches = self._step(
            self.variables, jnp.asarray(chunk[None, :]), self.caches)
        packed = np.asarray(packed)                    # ONE fetch per chunk
        t, wb = self._t, self._wb
        phone_ids = packed[:t].astype(np.int64)
        char_ids = packed[t:2 * t].astype(np.int64)
        prov_ids = packed[2 * t:2 * t + wb].astype(np.int64)
        n = int(packed[2 * t + wb])
        if n <= 0:
            return
        self._phone_ids.extend(int(i) for i in phone_ids[-n:])
        picked_any = False
        for i in char_ids:
            if i >= 0:
                self._char_ids.append(int(i))
        if any(phone_ids[-n:] != self.phone_blank):
            picked_any = True
        if picked_any:
            self._provisional_ids = [int(i) for i in prov_ids if i >= 0]

    # -- results ------------------------------------------------------------
    def result(self) -> dict:
        phone_seq = self._collapse(self._phone_ids, self.phone_blank)
        char_seq = self._collapse(self._char_ids + self._provisional_ids,
                                  self.char_blank)
        out = {"phone_ids": phone_seq, "char_ids": char_seq}
        if self.phone_featurizer is not None:
            out["phones"] = self.phone_featurizer.iextract(phone_seq)
        if self.text_featurizer is not None:
            out["text"] = "".join(self.text_featurizer.iextract(char_seq))
        return out

    @staticmethod
    def _collapse(ids: List[int], blank: int) -> List[int]:
        out: List[int] = []
        prev = -1
        for i in ids:
            if i != prev and i != blank:
                out.append(i)
            prev = i
        return out
