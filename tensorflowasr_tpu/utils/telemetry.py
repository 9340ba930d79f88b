"""Observability: profiler traces + throughput / RTF counters.

The reference has no tracing or throughput accounting — only ad-hoc
wall-clock prints (test_asr.py:127-152, am_dataloader.py:420-423 in
Z-yq/TensorflowASR). Here they are first-class (SURVEY.md §5):

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace directory;
- :class:`ThroughputMeter` — streaming audio-seconds/s, steps/s and
  examples/s over a sliding window (the BASELINE scaling metric);
- :class:`RTFMeter` — per-stream real-time-factor accounting for serving.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Deque, Tuple


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax profiler trace into ``logdir`` (view in TensorBoard
    or Perfetto)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_profiler_server(port: int = 9999) -> None:
    """On-demand profiling endpoint (connect with TensorBoard capture)."""
    import jax

    jax.profiler.start_server(port)


class ThroughputMeter:
    """Sliding-window throughput: call ``update(n_examples,
    audio_seconds)`` once per step."""

    def __init__(self, window: int = 100):
        self.window = window
        self._events: Deque[Tuple[float, int, float]] = deque()
        self.total_steps = 0
        self.total_examples = 0
        self.total_audio_seconds = 0.0
        self._t0 = time.perf_counter()

    def update(self, n_examples: int, audio_seconds: float) -> None:
        now = time.perf_counter()
        self._events.append((now, n_examples, audio_seconds))
        while len(self._events) > self.window:
            self._events.popleft()
        self.total_steps += 1
        self.total_examples += n_examples
        self.total_audio_seconds += audio_seconds

    def rates(self) -> dict:
        if len(self._events) < 2:
            return {"steps_per_s": 0.0, "examples_per_s": 0.0,
                    "audio_seconds_per_s": 0.0}
        dt = self._events[-1][0] - self._events[0][0]
        if dt <= 0:
            return {"steps_per_s": 0.0, "examples_per_s": 0.0,
                    "audio_seconds_per_s": 0.0}
        n = len(self._events) - 1
        ex = sum(e[1] for e in list(self._events)[1:])
        au = sum(e[2] for e in list(self._events)[1:])
        return {"steps_per_s": n / dt, "examples_per_s": ex / dt,
                "audio_seconds_per_s": au / dt}

    def summary(self) -> dict:
        wall = time.perf_counter() - self._t0
        out = self.rates()
        out.update(total_steps=self.total_steps,
                   total_examples=self.total_examples,
                   total_audio_seconds=self.total_audio_seconds,
                   wall_s=wall)
        return out


class RTFMeter:
    """Per-stream real-time factor: ``add(compute_seconds,
    audio_seconds)`` per inference call."""

    def __init__(self):
        self.compute_s = 0.0
        self.audio_s = 0.0
        self.calls = 0

    def add(self, compute_seconds: float, audio_seconds: float) -> None:
        self.compute_s += compute_seconds
        self.audio_s += audio_seconds
        self.calls += 1

    @property
    def rtf(self) -> float:
        return self.compute_s / max(self.audio_s, 1e-9)

    def result(self) -> dict:
        return {"rtf": self.rtf, "compute_s": self.compute_s,
                "audio_s": self.audio_s, "calls": self.calls}
