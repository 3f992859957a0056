"""Tracing, latency histograms, and structured metrics.

The reference has no profiling, metrics, or logging at all (survey §5 —
"not even print"). This module provides the TPU-native equivalents:

  * ``trace_to(dir)``       — jax.profiler trace (TensorBoard-viewable);
  * ``step_trace(name)``    — per-step trace annotation for the rollout loop;
  * ``LatencyTracker``      — latency percentiles (the north-star metric is
    p50 per-step latency, so the harness measures it natively);
  * ``MetricsLogger``       — JSONL event stream (per-episode/per-step).
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler trace for the duration of the block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_trace(name: str, step: Optional[int] = None):
    """Annotate a rollout/train step in profiler traces."""
    import jax

    kwargs = {"step_num": step} if step is not None else {}
    with jax.profiler.StepTraceAnnotation(name, **kwargs):
        yield


class LatencyTracker:
    """Collects wall-clock samples; reports percentiles."""

    def __init__(self):
        self._samples = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples.append(time.perf_counter() - t0)

    def add(self, seconds: float):
        self._samples.append(seconds)

    def summary(self) -> Dict[str, float]:
        if not self._samples:
            return {}
        s = np.asarray(self._samples)
        return {
            "count": int(s.size),
            "p50_ms": float(np.percentile(s, 50) * 1e3),
            "p90_ms": float(np.percentile(s, 90) * 1e3),
            "p99_ms": float(np.percentile(s, 99) * 1e3),
            "mean_ms": float(s.mean() * 1e3),
        }


class MetricsLogger:
    """Append-only JSONL event stream (file or stdout)."""

    def __init__(self, path: Optional[str] = None):
        self._fh = open(path, "a") if path else None

    def log(self, event: str, **fields):
        rec = {"event": event, "ts": time.time(), **fields}
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            print(line)

    def close(self):
        if self._fh:
            self._fh.close()
