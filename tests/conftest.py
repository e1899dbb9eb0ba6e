"""Test config: force CPU backend with 8 virtual devices.

SURVEY.md §4's fake-device trick — mesh/sharding/psum logic is tested on a
virtual 8-device CPU mesh; only performance numbers need the real TPU
(bench.py runs there).

This environment boots with an `axon` TPU PJRT plugin whose sitecustomize
imports jax and pins ``jax_platforms="axon,cpu"`` before any user code, so
an env-var override is not enough: we re-pin the config to cpu and clear
the already-initialized backends.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:  # pragma: no cover - older jax fallback
    pass

assert jax.default_backend() == "cpu", jax.default_backend()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_xla_caches_per_module():
    """Drop compiled executables between test MODULES.

    A single pytest process accumulates every module's XLA-CPU
    executables; at ~250 tests the NEXT compile segfaults inside
    backend_compile_and_load (deterministic position, passes standalone
    — measured round 4 on test_vendored_checkpoint after the export
    bundle grew to six artifacts).  Programs are shared heavily WITHIN
    a module (same tiny configs) and barely across modules, so a
    module-scoped clear costs little and keeps the long-process
    compile count bounded."""
    yield
    jax.clear_caches()
