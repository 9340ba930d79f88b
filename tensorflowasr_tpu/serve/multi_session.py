"""Many-concurrent-streams chunk serving on one chip.

The reference serves ONE stream per CPU core (ChunkConformer RTF 0.1,
reference README.md:172); its C++ session (Inference/CppInference) is a
single-stream state machine. On a TPU the batch-1 fused streaming step
(`serve/chunk_session.py`) leaves the MXU almost idle, so the natural
scaling axis is CONCURRENT STREAMS: `ChunkConformer.batched_stream_step`
vmaps the whole per-stream state machine over a slot axis and advances
every active session's 160 ms chunk in ONE dispatch.

`MultiStreamChunkServer` is the host-side slot-pool manager:

- a fixed pool of `n_slots` streams (static shapes: the program is
  compiled once for the pool size);
- `open()` leases a slot (its device state is zeroed on the slot's next
  advancing tick via the step's `reset` mask — no extra dispatch);
- `feed(slot, wav)` buffers audio host-side; `tick()` advances every slot
  that has a full chunk buffered (the `advance` mask freezes the others'
  state in-graph);
- `close(slot)` flushes residual audio and returns the final result.

Per-slot decode accumulation is identical to ChunkStreamSession — the
parity test (tests/test_multi_session.py) checks a pool of interleaved
sessions against independent single-stream sessions token-for-token.
"""

from __future__ import annotations

import threading
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tensorflowasr_tpu.models.chunk_conformer import ChunkConformer


class _SlotState:
    __slots__ = ("wav_rem", "phone_ids", "char_ids", "provisional_ids",
                 "active", "pending_reset")

    def __init__(self):
        self.wav_rem = np.zeros((0,), np.float32)
        self.phone_ids: List[int] = []
        self.char_ids: List[int] = []
        self.provisional_ids: List[int] = []
        self.active = False
        self.pending_reset = False


class MultiStreamChunkServer:
    def __init__(self, model: ChunkConformer, variables: dict,
                 n_slots: int = 16, phone_featurizer=None,
                 text_featurizer=None):
        self.model = model
        self.variables = variables
        self.cfg = model.cfg
        self.n_slots = n_slots
        self.phone_featurizer = phone_featurizer
        self.text_featurizer = text_featurizer
        self.phone_blank = model.num_phone_classes - 1
        self.char_blank = model.num_char_classes - 1
        t = self.cfg.sub_length
        wb = max(self.cfg.decoder.lookahead, 1)

        def step(v, wavs, caches, reset, advance):
            phone_ids, char_ids, prov_ids, n_final, new = model.apply(
                v, wavs, caches, reset, advance,
                method=ChunkConformer.batched_stream_step)
            packed = jnp.concatenate([
                phone_ids.astype(jnp.float32),
                char_ids.astype(jnp.float32),
                prov_ids.astype(jnp.float32),
                n_final.astype(jnp.float32),
            ], axis=1)                            # [S, t + t + wb + 1]
            return packed, new

        self._step = jax.jit(step)
        self._t = t
        self._wb = wb
        self.caches = model.apply(variables, n_slots,
                                  method=ChunkConformer.init_multi_stream_caches)
        self._slots = [_SlotState() for _ in range(n_slots)]
        self._free = list(range(n_slots - 1, -1, -1))

    # -- session lifecycle ---------------------------------------------------
    def open(self) -> int:
        """Lease a slot for a new stream; raises if the pool is full."""
        if not self._free:
            raise RuntimeError(f"all {self.n_slots} stream slots busy")
        slot = self._free.pop()
        s = self._slots[slot]
        s.__init__()
        s.active = True
        s.pending_reset = True     # device state zeroed on first advance
        return slot

    def feed(self, slot: int, wav: np.ndarray) -> None:
        """Buffer audio for a slot (no device work until tick())."""
        s = self._checked(slot)
        s.wav_rem = np.concatenate([s.wav_rem, np.asarray(wav, np.float32)])

    def tick(self) -> None:
        """Advance every slot with >= 1 full chunk buffered; repeats until
        no slot has a complete chunk left (bursty feeds drain fully).
        One fused dispatch + one packed fetch per iteration."""
        cs = self.cfg.chunk_samples
        while True:
            adv = np.array([s.active and len(s.wav_rem) >= cs
                            for s in self._slots], bool)
            if not adv.any():
                return
            self._dispatch(adv)

    def close(self, slot: int) -> dict:
        """Flush residual audio (zero-padded to one chunk), return the
        final result, release the slot."""
        s = self._checked(slot)
        if len(s.wav_rem) > 0:
            cs = self.cfg.chunk_samples
            pad = (-len(s.wav_rem)) % cs
            if pad:
                s.wav_rem = np.concatenate(
                    [s.wav_rem, np.zeros((pad,), np.float32)])
        self.tick()
        out = self.result(slot)
        s.active = False
        self._free.append(slot)
        return out

    # -- results -------------------------------------------------------------
    def result(self, slot: int) -> dict:
        s = self._checked(slot)
        phone_seq = _collapse(s.phone_ids, self.phone_blank)
        char_seq = _collapse(s.char_ids + s.provisional_ids, self.char_blank)
        out = {"phone_ids": phone_seq, "char_ids": char_seq}
        if self.phone_featurizer is not None:
            out["phones"] = self.phone_featurizer.iextract(phone_seq)
        if self.text_featurizer is not None:
            out["text"] = "".join(self.text_featurizer.iextract(char_seq))
        return out

    @property
    def n_active(self) -> int:
        return sum(s.active for s in self._slots)

    # -- internals -----------------------------------------------------------
    def _checked(self, slot: int) -> _SlotState:
        s = self._slots[slot]
        if not s.active:
            raise ValueError(f"slot {slot} is not an open stream")
        return s

    def _dispatch(self, adv: np.ndarray) -> None:
        cs = self.cfg.chunk_samples
        wavs = np.zeros((self.n_slots, cs), np.float32)
        reset = np.zeros((self.n_slots,), bool)
        for i, s in enumerate(self._slots):
            if adv[i]:
                wavs[i] = s.wav_rem[:cs]
                s.wav_rem = s.wav_rem[cs:]
                reset[i] = s.pending_reset
        packed, self.caches = self._step(
            self.variables, jnp.asarray(wavs), self.caches,
            jnp.asarray(reset), jnp.asarray(adv))
        packed = np.asarray(packed)                # ONE fetch per tick
        t, wb = self._t, self._wb
        for i, s in enumerate(self._slots):
            if not adv[i]:
                continue
            if reset[i]:
                s.pending_reset = False
            row = packed[i]
            phone_ids = row[:t].astype(np.int64)
            char_ids = row[t:2 * t].astype(np.int64)
            prov_ids = row[2 * t:2 * t + wb].astype(np.int64)
            n = int(row[2 * t + wb])
            if n <= 0:
                continue
            s.phone_ids.extend(int(j) for j in phone_ids[-n:])
            for j in char_ids:
                if j >= 0:
                    s.char_ids.append(int(j))
            if any(phone_ids[-n:] != self.phone_blank):
                s.provisional_ids = [int(j) for j in prov_ids if j >= 0]


class BatchingStreamFront:
    """Thread-safe dynamic-batching front over MultiStreamChunkServer.

    Network handlers (one thread per client connection, see
    model_server.py) call ``feed`` concurrently; a single ticker thread
    coalesces chunks that arrive within ``max_wait_ms`` of each other and
    advances them in ONE batched dispatch — the classic dynamic-batching
    scheduler, here for persistent streaming state instead of stateless
    requests. All device work happens on the ticker thread (single-TPU-
    thread discipline); callers block on a condition until their slot's
    buffered audio has been consumed.
    """

    def __init__(self, server: MultiStreamChunkServer,
                 max_wait_ms: float = 8.0, feed_deadline_s: float = 120.0):
        self._srv = server
        self._cv = threading.Condition()
        self._max_wait = max_wait_ms / 1000.0
        self._feed_deadline = feed_deadline_s
        self._stop = False
        self._dead: Optional[BaseException] = None   # ticker crash, if any
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # -- client API (any thread) --------------------------------------------
    def open(self) -> int:
        with self._cv:
            return self._srv.open()

    def feed(self, slot: int, wav: np.ndarray) -> dict:
        """Buffer audio and block until every complete chunk of this
        slot's buffer has been processed; returns the live result.

        Liveness: the wait is a bounded-interval heartbeat loop, not a
        bare ``wait_for`` — every second it re-checks the predicate, re-
        kicks the ticker (so a lost wakeup costs at most one heartbeat,
        never a hang), and verifies the ticker thread is alive.  A crash
        in the ticker propagates here instead of stranding clients, and
        after ``feed_deadline_s`` of zero progress a diagnostic of the
        pool state is raised rather than blocking forever.
        """
        import time as _time
        cs = self._srv.cfg.chunk_samples
        s = self._srv._slots[slot]
        with self._cv:
            self._srv.feed(slot, wav)
            self._cv.notify_all()     # wake the ticker
            deadline = _time.monotonic() + self._feed_deadline
            last_rem = len(s.wav_rem)
            while len(s.wav_rem) >= cs:
                self._check_ticker()
                if len(s.wav_rem) < last_rem:
                    # progress: the deadline bounds STALLS, not total
                    # drain time of a large buffered feed
                    last_rem = len(s.wav_rem)
                    deadline = _time.monotonic() + self._feed_deadline
                if _time.monotonic() > deadline:
                    raise RuntimeError(
                        f"feed(slot={slot}) made no progress for "
                        f"{self._feed_deadline:.0f}s; pool state: "
                        + self._debug_state())
                if not self._cv.wait(timeout=1.0):
                    # heartbeat: woke on timeout, not notify — re-kick
                    # the ticker in case a wakeup was lost anywhere
                    self._cv.notify_all()
            return self._srv.result(slot)

    def result(self, slot: int) -> dict:
        with self._cv:
            return self._srv.result(slot)

    def close(self, slot: int) -> dict:
        with self._cv:
            out = self._srv.close(slot)
            # close() ran a drain tick that may have consumed OTHER
            # slots' buffered chunks — their feeders are blocked on the
            # condition and MUST be woken (lost-wakeup hang otherwise;
            # seen as a >300s client stall in the round-3 suite run).
            self._cv.notify_all()
            return out

    def shutdown(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    def _check_ticker(self) -> None:
        if self._dead is not None:
            raise RuntimeError("batching ticker thread crashed") \
                from self._dead
        if self._stop:
            raise RuntimeError("BatchingStreamFront is shut down")
        if not self._thread.is_alive():
            raise RuntimeError("batching ticker thread is not running")

    def _debug_state(self) -> str:
        cs = self._srv.cfg.chunk_samples
        slots = [
            f"slot{i}(active={s.active}, buffered={len(s.wav_rem)}/{cs})"
            for i, s in enumerate(self._srv._slots)]
        return (f"ticker_alive={self._thread.is_alive()} "
                f"stop={self._stop} " + " ".join(slots))

    # -- ticker --------------------------------------------------------------
    def _has_full_chunk(self) -> bool:
        cs = self._srv.cfg.chunk_samples
        return any(s.active and len(s.wav_rem) >= cs
                   for s in self._srv._slots)

    def _loop(self) -> None:
        try:
            with self._cv:
                while True:
                    self._cv.wait_for(
                        lambda: self._stop or self._has_full_chunk())
                    if self._stop:
                        return
                    # coalescing window: let concurrently-arriving feeds
                    # join this tick (lock released while waiting)
                    if self._max_wait > 0:
                        self._cv.wait(timeout=self._max_wait)
                        if self._stop:
                            return
                    self._srv.tick()
                    self._cv.notify_all()
        except BaseException as e:            # propagate to blocked feeders
            with self._cv:
                self._dead = e
                self._cv.notify_all()
            raise


def build_stream_ops(front: BatchingStreamFront) -> Dict[str, Callable]:
    """Socket op table (model_server.py wire protocol) for multi-stream
    chunk serving. Ids-only results — text mapping stays client-side (the
    C++ host owns the Tokener, cpp/serving/include/tokener.h)."""

    def _pair(out: dict):
        return [np.asarray(out["phone_ids"], np.int32),
                np.asarray(out["char_ids"], np.int32)]

    def stream_info() -> np.ndarray:
        """[chunk_samples, sample_rate, n_slots] — clients pace their
        feeds from this."""
        srv = front._srv
        return np.asarray([srv.cfg.chunk_samples, srv.cfg.sample_rate,
                           srv.n_slots], np.int32)

    def stream_open() -> np.ndarray:
        return np.asarray([front.open()], np.int32)

    def stream_feed(slot: np.ndarray, wav: np.ndarray):
        return _pair(front.feed(int(slot.reshape(-1)[0]),
                                wav.reshape(-1)))

    def stream_result(slot: np.ndarray):
        return _pair(front.result(int(slot.reshape(-1)[0])))

    def stream_close(slot: np.ndarray):
        return _pair(front.close(int(slot.reshape(-1)[0])))

    return {"stream_info": stream_info, "stream_open": stream_open,
            "stream_feed": stream_feed, "stream_result": stream_result,
            "stream_close": stream_close}


def _collapse(ids: List[int], blank: int) -> List[int]:
    out: List[int] = []
    prev = -1
    for i in ids:
        if i != prev and i != blank:
            out.append(i)
        prev = i
    return out
