"""Driver contract: __graft_entry__.entry + dryrun_multichip must work."""

import sys
import os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.block_until_ready(jax.jit(fn)(*args))
    assert out.shape[-2:] == (32, 2)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_cold_subprocess():
    """Regression for round-1 driver failure (MULTICHIP_r01.json rc=1).

    Under pytest, conftest.py already created 8 virtual CPU devices, so
    ``_ensure_devices`` early-returns and the cold-start backend-reset
    branch is never exercised in-process. The driver runs in a FRESH
    interpreter where ``len(jax.devices())`` probes (and initializes) the
    axon backend first; ``jax_num_cpu_devices`` may then only be updated
    after ``clear_backends()``. Spawn a clean subprocess to hit exactly
    that path.
    """
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # Make sure no test-env override hides the cold-start path.
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, f"stdout={proc.stdout}\nstderr={proc.stderr}"
    assert "dryrun_multichip OK" in proc.stdout
