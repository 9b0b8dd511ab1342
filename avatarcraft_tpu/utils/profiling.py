"""Profiling / tracing / metrics — first-class observability.

The reference has none (SURVEY.md §5: commented-out cuda.synchronize probes).
Here:

* :class:`StepTimer` — wall-clock per-step timing with compile-step exclusion
  and EMA, relay-safe (forces a readback fence when asked);
* :func:`trace` — context manager around ``jax.profiler`` emitting
  TensorBoard-loadable traces;
* :class:`MetricsLogger` — JSONL metrics stream (rays/sec, iters/sec, loss,
  PSNR) consumed by the bench harness and the CLIs.
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import jax


class StepTimer:
    """Tracks step wall time, skipping the first ``skip`` (compile) steps."""

    def __init__(self, skip: int = 1, ema: float = 0.9):
        self.skip = skip
        self.ema = ema
        self.n = 0
        self.avg = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float | None:
        """End the step; optionally force a device sync by fetching a scalar
        (pass e.g. the loss) — plain block_until_ready is unreliable through
        the remote-execution relay on fresh results."""
        if sync_value is not None:
            float(sync_value) if hasattr(sync_value, "__float__") else jax.block_until_ready(sync_value)
        dt = time.perf_counter() - self._t0
        self.n += 1
        if self.n <= self.skip:
            return None
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return dt

    def rate(self, units_per_step: float = 1.0) -> float:
        return units_per_step / self.avg if self.avg else 0.0


@contextlib.contextmanager
def trace(logdir: str, enabled: bool = True):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (host-side)."""
    return jax.profiler.TraceAnnotation(name)


class MetricsLogger:
    """Append-only JSONL metrics stream."""

    def __init__(self, path: str | None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")
        else:
            self._fh = None

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **metrics}
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
