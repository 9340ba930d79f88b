"""ChunkConformer dataloader: AM batching + the extra text-only branch.

Functional parity with the reference Chunk_DataLoader
(asr/dataloaders/chunk_dataloader.py:14-440 in Z-yq/TensorflowASR):
same per-line pipeline as the AM loader (pinyin -> phone via
pinyin2phone.map with tone5 fallback, :65-97) but

- wav is padded to a multiple of ``chunk_samples`` so the 'valid' chunk
  front sees whole chunks; input_length counts encoder frames
  (chunks * sub_length);
- each item additionally samples an EXTRA text line for the ContextHelper
  text-only co-training branch (:281-284, 402-416), emitting
  extra_phones / extra_chars.

Emitted batch extends the AM dict with extra_phones [B, Le],
extra_phone_length, extra_chars [B, Ue], extra_char_length.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from tensorflowasr_tpu.data.am_dataloader import AMDataLoader, BucketSpec


class ChunkDataLoader(AMDataLoader):
    def __init__(self, config, phone_featurizer, text_featurizer,
                 chunk_num: int = 16, **kwargs):
        super().__init__(config, phone_featurizer, text_featurizer, **kwargs)
        sc = config["speech_config"] or {}
        # reference chunk labels are plain chars — no stop token
        # (chunk_dataloader.py:353 extract() vs am_dataloader.py:181's
        # +endid): the char branch neither learns nor is scored on </S>
        self.append_char_endid = False
        hop = self.featurizer.hop_size
        self.chunk_samples = chunk_num * hop
        self.sub_length = chunk_num // self.featurizer.reduction_factor
        # re-quantize bucket wav capacities to whole chunks
        for b in self.buckets:
            pad = (-b.wav_cap) % self.chunk_samples
            b.wav_cap += pad

    def _input_length(self, n_samples: int) -> int:
        chunks = (n_samples + self.chunk_samples - 1) // self.chunk_samples
        return int(chunks * self.sub_length)

    def _extra_text(self, train: bool):
        """Sample an extra transcript for the helper branch."""
        for _ in range(50):
            with self._line_lock:
                line = self._next_line(train)
            try:
                _, txt = line.split("\t", 1)
            except ValueError:
                continue
            try:
                py = self.text_to_phones(txt)
            except Exception:
                continue
            if not self._check_valid(py, self.phone_featurizer):
                continue
            chars = (txt.split() if self.transcripts_are_pinyin
                     else list(txt))
            if not self._check_valid(chars, self.text_featurizer):
                continue
            # plain chars, like the main branch (reference
            # chunk_dataloader.py:357 extracts without any stop token)
            return (self.phone_featurizer.extract(py),
                    self.text_featurizer.extract(chars))
        raise RuntimeError("could not sample a valid extra text line")

    def generate(self, train: bool = True,
                 bucket: Optional[BucketSpec] = None,
                 num_workers: int = 1) -> Dict[str, np.ndarray]:
        batch = super().generate(train, bucket, num_workers=num_workers)
        n = batch["wav"].shape[0]
        # infer the bucket used from the packed capacities
        phone_cap = batch["phones"].shape[1]
        char_cap = batch["chars"].shape[1]
        ex_ph = np.zeros((n, phone_cap), np.int32)
        ex_ch = np.zeros((n, char_cap), np.int32)
        ex_ph_len = np.zeros((n,), np.int32)
        ex_ch_len = np.zeros((n,), np.int32)
        for i in range(n):
            for _ in range(20):
                ph, ch = self._extra_text(train)
                if len(ph) <= phone_cap and len(ch) <= char_cap:
                    break
            ph = ph[:phone_cap]
            ch = ch[:char_cap]
            ex_ph[i, :len(ph)] = ph
            ex_ch[i, :len(ch)] = ch
            ex_ph_len[i] = len(ph)
            ex_ch_len[i] = len(ch)
        batch.update(extra_phones=ex_ph, extra_phone_length=ex_ph_len,
                     extra_chars=ex_ch, extra_char_length=ex_ch_len)
        return batch

    # generator() inherited from AMDataLoader (incl. prefetch support)
