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
