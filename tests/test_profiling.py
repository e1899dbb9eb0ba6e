"""Profiling utilities tests (SURVEY §5 tracing/observability)."""

import jax
import jax.numpy as jnp

from ndivplanning_tpu.utils.profiling import StepTimer, enable_nan_debugging


def test_step_timer_rates():
    x = jnp.ones((8, 8))
    timer = StepTimer()
    timer.start(sync_on=x)
    for _ in range(5):
        x = x * 1.0000001
        timer.lap()
    rate = timer.rate(sync_on=x)
    assert rate > 0


def test_nan_debugging_toggle():
    enable_nan_debugging(True)
    assert jax.config.jax_debug_nans
    enable_nan_debugging(False)
    assert not jax.config.jax_debug_nans


def test_device_sync_completes():
    from ndivplanning_tpu.utils.profiling import device_sync

    x = jnp.ones((4, 4)) * 2.0
    device_sync(x)  # must not raise, must block until value is real
    device_sync({"a": x, "b": x})  # pytrees too


def test_trace_writes_or_fails_fast(tmp_path):
    """trace() either produces a trace (CPU backend here) or raises a
    clear RuntimeError (axon tunnel) — never hangs."""
    import os

    from ndivplanning_tpu.utils.profiling import _tracing_supported, trace

    ok, why = _tracing_supported()
    if not ok:
        assert "axon" in why
        return
    with trace(str(tmp_path)):
        jnp.ones((8, 8)).sum()
    assert os.listdir(str(tmp_path))  # trace files written
