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
