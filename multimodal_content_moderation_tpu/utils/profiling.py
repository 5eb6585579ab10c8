"""Profiling / tracing / debugging utilities.

The reference has no profiling at all (SURVEY.md §5); this provides the
TPU-native observability kit:

- ``trace(log_dir)``: context manager around ``jax.profiler`` — produces an
  XPlane trace viewable in TensorBoard/Perfetto, annotated with
  ``annotate`` ranges.
- ``annotate(name)``: TraceAnnotation for host-side phases (input pipeline,
  metric computation) so they show up alongside device ops.
- ``StepTimer``: rolling per-step wall-time/throughput with warmup skip.
- ``enable_nan_checks()``: turns on ``jax_debug_nans`` (XLA re-runs the
  offending op un-jitted and raises with a stack trace).
- ``assert_finite(tree)``: host-side pytree finiteness check for tests and
  debug runs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named host-side range in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-time stats with compile-step warmup skipping."""

    def __init__(self, warmup: int = 1, window: int = 100):
        self.warmup = warmup
        self.window = window
        self._times: list = []
        self._count = 0
        self._last: Optional[float] = None

    def reset_clock(self) -> None:
        """Forget the last tick (call after eval/checkpoint pauses so the gap
        is not recorded as a step); rolling stats are kept."""
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._times.append(now - self._last)
                if len(self._times) > self.window:
                    self._times.pop(0)
        self._last = now

    @property
    def mean_step_seconds(self) -> float:
        return float(np.mean(self._times)) if self._times else 0.0

    def samples_per_second(self, batch_size: int) -> float:
        s = self.mean_step_seconds
        return batch_size / s if s > 0 else 0.0


def enable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", True)


def disable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", False)


def assert_finite(tree: Any, name: str = "tree") -> None:
    """Raise with the offending path if any leaf has a NaN/Inf."""
    bad = []

    def check(path, leaf):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.all(np.isfinite(arr)):
            bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(check, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:5]}")
