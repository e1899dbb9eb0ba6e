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
