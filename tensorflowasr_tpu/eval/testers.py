"""Evaluation harnesses: SER/CER with S/I/D breakdowns.

Re-designs the reference tester stack (asr/tester/base_tester.py:19-96,
am_tester.py:34-158, chunk_tester.py:33-72, vad/tester/vad_tester.py:26-48,
punc_recover/tester/punc_tester.py:27-48 in Z-yq/TensorflowASR): each
tester drives the jitted predict/eval step over an eval iterator and
accumulates streaming metrics host-side.

All testers share the loop shape:
    tester.run(batch_iter, max_batches) -> dict of final metrics
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Iterable, Optional

import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.utils.metrics import ErrorRateAccumulator

logger = logging.getLogger(__name__)


def _trim_pad(ids: np.ndarray, length: int) -> list:
    return list(ids[:length])


class AMTester:
    """Offline/block-streaming ConformerCTC eval: phone SER/CER from greedy
    CTC + char SER/CER from the translator (am_tester.py:34-158)."""

    def __init__(self, trainer, log_every: int = 20,
                 char_end_id: Optional[int] = None):
        self.trainer = trainer
        self.log_every = log_every
        self.char_end_id = char_end_id
        self.phone_acc = ErrorRateAccumulator("cer")
        self.char_acc = ErrorRateAccumulator("cer")

    def run(self, batch_iter: Iterable[Dict[str, np.ndarray]],
            max_batches: Optional[int] = None) -> dict:
        self.phone_acc.reset()
        self.char_acc.reset()
        for step, batch in enumerate(batch_iter):
            if max_batches is not None and step >= max_batches:
                break
            wav = jnp.asarray(batch["wav"])
            in_len = jnp.asarray(batch["input_length"])
            phone_ids, phone_lens, char_ids = self.trainer.predict_step(
                self.trainer.state, wav, in_len)
            phone_ids = np.asarray(phone_ids)
            phone_lens = np.asarray(phone_lens)
            char_ids = np.asarray(char_ids)
            for i in range(wav.shape[0]):
                ref_p = _trim_pad(batch["phones"][i],
                                  int(batch["phone_length"][i]))
                hyp_p = _trim_pad(phone_ids[i], int(phone_lens[i]))
                self.phone_acc.update(ref_p, hyp_p)
                # endid stripped from BOTH sides like the reference
                # (am_tester.py:75-80) — references carry </S> but the
                # translator hypothesis stops AT it; counting it scored a
                # guaranteed deletion per utterance (~+11% char CER on
                # 9-char utts)
                ref_c = [v for v in _trim_pad(batch["chars"][i],
                                              int(batch["char_length"][i]))
                         if v != self.char_end_id]
                hyp_c = self._trim_chars(char_ids[i])
                self.char_acc.update(ref_c, hyp_c)
            if (step + 1) % self.log_every == 0:
                logger.info("eval step %d: %s", step + 1, self.result())
        return self.result()

    def _trim_chars(self, ids: np.ndarray) -> list:
        """Strip trailing output like test_asr.py:206-219: stop at the
        first pad (0) or the </S> end id when configured."""
        out = []
        for v in ids:
            if v == 0 or (self.char_end_id is not None
                          and v == self.char_end_id):
                break
            out.append(int(v))
        return out

    def result(self) -> dict:
        return {**{f"phone_{k}": v for k, v in
                   self.phone_acc.result().items()},
                **{f"char_{k}": v for k, v in self.char_acc.result().items()}}


class ChunkTester:
    """ChunkConformer offline eval: char CER from the picked-frame decoder
    + phone CER from the picker (chunk_tester.py:33-72)."""

    def __init__(self, predict_step: Callable, state, log_every: int = 20):
        self.predict_step = predict_step
        self.state = state
        self.log_every = log_every
        self.phone_acc = ErrorRateAccumulator("cer")
        self.char_acc = ErrorRateAccumulator("cer")

    def run(self, batch_iter, max_batches: Optional[int] = None) -> dict:
        self.phone_acc.reset()
        self.char_acc.reset()
        for step, batch in enumerate(batch_iter):
            if max_batches is not None and step >= max_batches:
                break
            char_ids, char_lens, phone_ids, phone_lens = self.predict_step(
                self.state, jnp.asarray(batch["wav"]),
                jnp.asarray(batch["input_length"]))
            char_ids = np.asarray(char_ids)
            char_lens = np.asarray(char_lens)
            phone_ids = np.asarray(phone_ids)
            phone_lens = np.asarray(phone_lens)
            for i in range(batch["wav"].shape[0]):
                self.phone_acc.update(
                    _trim_pad(batch["phones"][i],
                              int(batch["phone_length"][i])),
                    _trim_pad(phone_ids[i], int(phone_lens[i])))
                self.char_acc.update(
                    _trim_pad(batch["chars"][i],
                              int(batch["char_length"][i])),
                    _trim_pad(char_ids[i], int(char_lens[i])))
            if (step + 1) % self.log_every == 0:
                logger.info("eval step %d: %s", step + 1, self.result())
        return self.result()

    def result(self) -> dict:
        return {**{f"phone_{k}": v for k, v in
                   self.phone_acc.result().items()},
                **{f"char_{k}": v for k, v in self.char_acc.result().items()}}


class VADTester:
    """Binary frame accuracy + F1 (vad_tester.py:26-48)."""

    def __init__(self, eval_step: Callable, state):
        self.eval_step = eval_step
        self.state = state

    def run(self, batch_iter, max_batches: Optional[int] = None) -> dict:
        accs, f1s = [], []
        for step, batch in enumerate(batch_iter):
            if max_batches is not None and step >= max_batches:
                break
            m = self.eval_step(self.state,
                               {k: jnp.asarray(v) for k, v in batch.items()})
            accs.append(float(m["vad_acc"]))
            f1s.append(float(m["f1"]))
        return {"acc": float(np.mean(accs)), "f1": float(np.mean(f1s))}


class PuncTester:
    """Masked punctuation accuracy (punc_tester.py:27-48)."""

    def __init__(self, eval_step: Callable, state):
        self.eval_step = eval_step
        self.state = state

    def run(self, batch_iter, max_batches: Optional[int] = None) -> dict:
        accs, losses = [], []
        for step, batch in enumerate(batch_iter):
            if max_batches is not None and step >= max_batches:
                break
            m = self.eval_step(self.state,
                               {k: jnp.asarray(v) for k, v in batch.items()})
            accs.append(float(m["bd_acc"]))
            losses.append(float(m["bd_loss"]))
        return {"bd_acc": float(np.mean(accs)),
                "bd_loss": float(np.mean(losses))}
