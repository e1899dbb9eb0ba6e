"""Tracing / profiling / numerics-debug aids (SURVEY.md §5).

- :func:`trace`: context manager around hot loops writing a
  TensorBoard/Perfetto trace via ``jax.profiler``.  Fails fast on the
  axon-tunnelled dev chip, where ``start_trace`` is known to hang
  (CLAUDE.md); use scan-on-device timing there instead
  (benchmarks/ndiv_kernel_bench.py methodology).
- :func:`enable_nan_debugging`: flips ``jax_debug_nans`` — the rebuild's
  analogue of a sanitizer pass (XLA owns thread-level concurrency, so
  there is nothing thread-level to sanitize; numeric poison is the
  failure mode that matters here).
- :func:`device_sync` / :class:`StepTimer`: honest wall-clock timing.
  ``jax.block_until_ready`` returns EARLY through the axon tunnel, so the
  only honest sync point is a real device_get — ``device_sync`` fetches
  one element of the array to the host.  bench.py's ``_time_it`` follows
  the same discipline.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


def _tracing_supported() -> tuple[bool, str]:
    backend = jax.default_backend()
    platform = getattr(jax.devices()[0], "platform", backend)
    if "axon" in (backend, platform):
        return False, (
            "jax.profiler tracing hangs through the axon TPU tunnel on "
            "this dev chip; time hot loops with on-device lax.scan "
            "chunks ending in a device_get instead "
            "(see benchmarks/ndiv_kernel_bench.py and utils.profiling."
            "StepTimer)"
        )
    return True, ""


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a region: ``with trace('/tmp/tb'): run_hot_loop()``.

    Raises ``RuntimeError`` up front on backends where the trace would
    hang (the axon tunnel), instead of wedging the run.
    """
    ok, why = _tracing_supported()
    if not ok:
        raise RuntimeError(why)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def device_sync(x) -> None:
    """Honest completion barrier: device_get one element of ``x``.

    ``jax.block_until_ready`` lies through the axon tunnel (returns
    before remote execution completes); fetching a value cannot.
    """
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel")
                              else leaf))


class StepTimer:
    """Wall-clock over completed device work, synced via device_get."""

    def __init__(self):
        self._t0 = None
        self._steps = 0

    def start(self, sync_on=None):
        if sync_on is not None:
            device_sync(sync_on)
        self._t0 = time.perf_counter()
        self._steps = 0

    def lap(self, n: int = 1):
        self._steps += n

    def rate(self, sync_on=None) -> float:
        if sync_on is not None:
            device_sync(sync_on)
        dt = time.perf_counter() - self._t0
        return self._steps / max(dt, 1e-12)
