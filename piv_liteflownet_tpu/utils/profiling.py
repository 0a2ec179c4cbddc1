"""Profiling hooks (the reference has wall-clock timers only,
``src/utils.py:142-190``; the TPU-native equivalent is an XLA trace).

``trace(logdir)`` captures a ``jax.profiler`` trace viewable in
TensorBoard/XProf. Degrades to a no-op (with a warning) when the backend
can't trace (e.g. through the axon relay, which scrubs dump paths).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str | None):
    """Context manager: capture a device trace into ``logdir`` (if truthy)."""
    if not logdir:
        yield
        return
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"[profiling] trace unavailable: {e}")
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"[profiling] trace written to {logdir} "
                      f"({time.perf_counter() - t0:.2f}s span)")
            except Exception as e:  # pragma: no cover
                print(f"[profiling] stop_trace failed: {e}")


class StepTimer:
    """Rolling per-step latency/throughput tracker for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def mean_s(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean_s if self.mean_s else 0.0
