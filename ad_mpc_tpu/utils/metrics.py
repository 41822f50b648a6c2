"""Latency/throughput metrics and profiling hooks.

The reference instruments solves with ad-hoc ``time.time()`` deltas
(``gp_ad_mpc_node.py:195-219``, ``trajectory_test.py:109-111``); SURVEY.md
§5 asks the rebuild for first-class p50/p99 counters plus ``jax.profiler``
integration. This module provides both.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class LatencyTracker:
    """Per-event latency accumulator with percentile reporting."""

    def __init__(self, name: str = "solve", budget_ms: float | None = None):
        self.name = name
        self.budget_ms = budget_ms
        self._samples_ms: list[float] = []

    @contextlib.contextmanager
    def measure(self):
        tic = time.perf_counter()
        try:
            yield
        finally:
            self._samples_ms.append(1e3 * (time.perf_counter() - tic))

    def add(self, seconds: float):
        self._samples_ms.append(1e3 * seconds)

    def __len__(self):
        return len(self._samples_ms)

    def stats(self, skip_warmup: int = 0) -> dict:
        a = np.asarray(self._samples_ms[skip_warmup:])
        if len(a) == 0:
            return {"name": self.name, "count": 0}
        out = {
            "name": self.name,
            "count": int(len(a)),
            "mean_ms": float(a.mean()),
            "p50_ms": float(np.percentile(a, 50)),
            "p99_ms": float(np.percentile(a, 99)),
            "max_ms": float(a.max()),
            "rate_hz": float(1e3 / a.mean()),
        }
        if self.budget_ms is not None:
            out["budget_ms"] = self.budget_ms
            out["overruns"] = int(np.sum(a > self.budget_ms))
        return out

    def reset(self):
        self._samples_ms.clear()


class ThroughputTracker:
    """Batched-solve throughput (solves/s) over timed windows."""

    def __init__(self):
        self._windows: list[tuple[int, float]] = []

    @contextlib.contextmanager
    def window(self, n_items: int):
        tic = time.perf_counter()
        try:
            yield
        finally:
            self._windows.append((n_items, time.perf_counter() - tic))

    def rate(self) -> float:
        if not self._windows:
            return 0.0
        items = sum(n for n, _ in self._windows)
        secs = sum(t for _, t in self._windows)
        return items / max(secs, 1e-12)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Wrap a region in a ``jax.profiler`` trace (TensorBoard-viewable) —
    the TPU-native replacement for the reference's wall-clock prints."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
