"""Tracing / profiling — first-class per-phase timers + jax.profiler hooks.

The reference has no tracing beyond wall-clock prints (SURVEY.md §5).  Here:
- ``PhaseTimer``: named phase timing (preprocess / vision / prefill / decode)
  with forced device sync so numbers mean something under async dispatch;
- ``trace()``: context manager around ``jax.profiler`` producing a TensorBoard
  trace directory;
- ``Counters``: process-wide monotonic counters (tokens generated, requests,
  images encoded) for the serving surfaces.
"""
from __future__ import annotations

import collections
import contextlib
import threading
import time
from typing import Dict, Optional

import numpy as np


def sync(x=None) -> None:
    """Force outstanding device work to finish (device_get round-trip —
    block_until_ready is unreliable under the axon tunnel platform)."""
    import jax

    if x is not None:
        np.asarray(jax.device_get(x))
    else:
        np.asarray(jax.device_get(jax.numpy.zeros(())))


class PhaseTimer:
    """Accumulates wall time per named phase.

    >>> t = PhaseTimer()
    >>> with t.phase("prefill", sync_on=state.last_token): ...
    >>> t.summary()  # {'prefill': {'total_s': ..., 'count': ..., 'p50_ms': ...}}
    """

    def __init__(self):
        self._times: Dict[str, list] = collections.defaultdict(list)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        result = {}
        try:
            yield result
        finally:
            if sync_on is not None:
                sync(sync_on)
            elif "sync_on" in result:
                sync(result["sync_on"])
            dt = time.perf_counter() - t0
            with self._lock:
                self._times[name].append(dt)

    def summary(self) -> Dict[str, dict]:
        out = {}
        with self._lock:
            for name, ts in self._times.items():
                arr = np.asarray(ts)
                out[name] = {
                    "count": len(ts),
                    "total_s": float(arr.sum()),
                    "mean_ms": float(arr.mean() * 1e3),
                    "p50_ms": float(np.median(arr) * 1e3),
                    "p95_ms": float(np.percentile(arr, 95) * 1e3),
                }
        return out

    def reset(self) -> None:
        with self._lock:
            self._times.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a code block (open in TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Counters:
    """Monotonic named counters (thread-safe)."""

    def __init__(self):
        self._c: Dict[str, int] = collections.defaultdict(int)
        self._lock = threading.Lock()

    def add(self, name: str, value: int = 1) -> None:
        with self._lock:
            self._c[name] += value

    def get(self, name: str) -> int:
        with self._lock:
            return self._c[name]

    def snapshot(self) -> Dict[str, int]:
        with self._lock:
            return dict(self._c)


GLOBAL_COUNTERS = Counters()
GLOBAL_TIMER = PhaseTimer()
