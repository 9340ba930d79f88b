"""Process-based batch production (true host parallelism).

The thread pool in :mod:`tensorflowasr_tpu.data.prefetch` overlaps wav IO
with device compute, but the Python-heavy parts of batch prep (pypinyin,
token mapping, spec-aug, packing) serialize on the GIL — measured on the
synthetic-Mandarin recipe, batch production capped training at ~1.4
steps/s while the TPU step itself runs >10 steps/s. This module is the
reference's ``fit(workers=10, use_multiprocessing=True)`` counterpart
(train_asr.py:111-112): N worker PROCESSES each own a full dataloader
over a shard of the train list and stream packed batches through a
bounded queue.

Each worker:
- pins JAX to CPU before anything else (a spawned child must never grab
  the TPU the parent is training on);
- builds its loader via a picklable ``factory(worker_id, num_workers)``
  (use ``functools.partial`` over the module-level stream functions in
  ``cli/common.py``) and iterates it forever;
- forwards exceptions to the consumer instead of dying silently.
"""

from __future__ import annotations

import multiprocessing as mp
import queue as pyqueue
import traceback
from typing import Callable, Iterator


_ERR_KEY = "__mp_worker_error__"


def _worker_main(factory, worker_id: int, num_workers: int, q, stop_evt):
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001 - jax is optional for pure-numpy loaders
        pass
    try:
        it = factory(worker_id, num_workers)
        for batch in it:
            while not stop_evt.is_set():
                try:
                    q.put(batch, timeout=0.2)
                    break
                except pyqueue.Full:
                    continue
            if stop_evt.is_set():
                return
    except BaseException:  # noqa: BLE001 - forwarded to consumer
        try:
            q.put({_ERR_KEY: traceback.format_exc()}, timeout=5)
        except pyqueue.Full:
            pass


class MPBatchIterator:
    """Endless batch iterator backed by ``num_workers`` spawn processes.

    ``factory(worker_id, num_workers)`` must be picklable (a top-level
    function or functools.partial over one) and return an iterator of
    batches; each worker should shard its data by ``worker_id`` so the
    union covers the corpus.
    """

    def __init__(self, factory: Callable[[int, int], Iterator],
                 num_workers: int = 2, depth: int = 4):
        ctx = mp.get_context("spawn")
        self._queue = ctx.Queue(maxsize=max(1, depth))
        self._stop = ctx.Event()
        self._procs = [
            ctx.Process(target=_worker_main,
                        args=(factory, i, num_workers, self._queue,
                              self._stop),
                        daemon=True)
            for i in range(max(1, num_workers))]
        for p in self._procs:
            p.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        while True:
            try:
                item = self._queue.get(timeout=0.5)
            except pyqueue.Empty:
                if not any(p.is_alive() for p in self._procs):
                    raise RuntimeError(
                        "all data worker processes exited") from None
                continue
            if isinstance(item, dict) and _ERR_KEY in item:
                self.close()
                raise RuntimeError(
                    f"data worker failed:\n{item[_ERR_KEY]}")
            return item

    next = __next__

    def close(self):
        self._stop.set()
        # drain so workers blocked on put() can see the stop event
        try:
            while True:
                self._queue.get_nowait()
        except pyqueue.Empty:
            pass
        for p in self._procs:
            p.join(timeout=3)
            if p.is_alive():
                p.terminate()

    def __del__(self):  # noqa: D105
        try:
            self._stop.set()
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass
