"""Observability: iteration-rate counters and profiler hooks.

The reference has no tracing/profiling support (SURVEY.md §5 — all report
numbers were ad-hoc wall-clock scripts). qoc_tpu provides:

- :class:`RateMeter` — steps/s and iterations/s counters with EWMA smoothing,
- :func:`trace_annotation` — named ``jax.profiler`` trace spans around
  iteration/propagation regions (visible in TensorBoard/Perfetto captures),
- :func:`start_trace` / :func:`stop_trace` — thin wrappers over
  ``jax.profiler`` device tracing.
"""

import contextlib
import time

import jax

__all__ = ["RateMeter", "trace_annotation", "start_trace", "stop_trace"]


class RateMeter:
    """Counts events (iterations, propagation steps) and reports rates."""

    def __init__(self, smoothing=0.9):
        self.smoothing = smoothing
        self.count = 0
        self._start = None
        self._last = None
        self._ewma_rate = None
        self._first_tick = None
        self._first_count = 0

    def start(self):
        self._start = self._last = time.perf_counter()
        return self

    def tick(self, n=1):
        """Record ``n`` events; returns the instantaneous rate (events/s)."""
        if self._start is None:
            self.start()
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.count += n
        if self._first_tick is None:
            self._first_tick = now
            self._first_count = n
        rate = n / dt if dt > 0 else float("inf")
        if self._ewma_rate is None:
            self._ewma_rate = rate
        else:
            self._ewma_rate = (self.smoothing * self._ewma_rate
                               + (1 - self.smoothing) * rate)
        return rate

    @property
    def rate(self):
        """EWMA-smoothed events/s."""
        return self._ewma_rate or 0.0

    @property
    def mean_rate(self):
        """Mean events/s since start()."""
        if self._start is None or self.count == 0:
            return 0.0
        elapsed = self._last - self._start
        return self.count / elapsed if elapsed > 0 else float("inf")

    @property
    def steady_rate(self):
        """Mean events/s excluding the interval up to the FIRST tick — the
        first chunk carries tracing/compilation, so this is the honest
        steady-state rate of a warm run. Falls back to ``mean_rate`` when
        only one tick was recorded."""
        if self._first_tick is None or self.count <= self._first_count:
            return self.mean_rate
        elapsed = self._last - self._first_tick
        steady_count = self.count - self._first_count
        return steady_count / elapsed if elapsed > 0 else float("inf")


@contextlib.contextmanager
def trace_annotation(name):
    """Named span recorded in jax profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_trace(log_dir):
    """Begin a device trace (view in TensorBoard's profile tab/Perfetto)."""
    jax.profiler.start_trace(log_dir)


def stop_trace():
    jax.profiler.stop_trace()
