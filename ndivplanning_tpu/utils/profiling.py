"""Tracing / profiling / numerics-debug aids (SURVEY.md §5).

- :func:`trace`: context manager around hot loops writing a
  TensorBoard/Perfetto trace via ``jax.profiler``.
- :func:`enable_nan_debugging`: flips ``jax_debug_nans`` — the rebuild's
  analogue of a sanitizer pass (XLA owns thread-level concurrency, so
  there is nothing thread-level to sanitize; numeric poison is the
  failure mode that matters here).
- :class:`StepTimer`: honest steps/sec with ``block_until_ready``
  discipline, used by bench.py and the train loop.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a region: ``with trace('/tmp/tb'): run_hot_loop()``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


class StepTimer:
    """Wall-clock over completed device work (block-until-ready honest)."""

    def __init__(self):
        self._t0 = None
        self._steps = 0

    def start(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        self._t0 = time.perf_counter()
        self._steps = 0

    def lap(self, n: int = 1):
        self._steps += n

    def rate(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        return self._steps / max(dt, 1e-12)
