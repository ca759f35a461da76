"""Tracing / profiling hooks — a gap in the reference (SURVEY §5: "none").

``trace_context`` wraps ``jax.profiler`` so any training window can be
captured for xprof/tensorboard; ``step_timer`` gives cheap wall-clock
per-step timing with EMA (the only timing the reference had was the viewer's
FPS printout, viewer.py:117-118).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_context(log_dir: str | None):
    """Profile the enclosed steps into ``log_dir`` (no-op if None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """EMA step timer: ``with timer: ...`` then ``timer.ema_ms``."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.ema_ms: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = (time.perf_counter() - self._t0) * 1e3
        self.ema_ms = dt if self.ema_ms is None else (
            self.alpha * dt + (1 - self.alpha) * self.ema_ms
        )
        return False
