"""Randomized-shape fuzz: Pallas kernel == torch oracle (== jnp reference).

SURVEY.md §4 unit/math names "hypothesis-style random shapes (k in 2..64,
dz in 1..16)" explicitly; the fixed parametrized grids in test_ndiv.py /
test_ndiv_pallas.py leave untested (batch, k, d) combinations — especially
around the kernel's padding boundaries — to inspection.  This seeded sweep
closes that: ~100 cases drawn from k in [2, 64], dz in [1, 16],
dx in [1, 128], batch in [1, 64], plus deliberate boundary cases at the
sublane edges (k = 8m +- 1) and the row-tile batch edges (batch = tb +- 1
for both kernel layouts), asserting value parity on every case and
gradient parity on a deterministic subset.

Cost design: every distinct shape costs a fresh interpret-mode kernel
trace (~0.7 s fwd / ~1.6 s grad on the CPU backend), so the EAGER torch
oracle — zero trace cost — is the per-case reference; the jnp reference
path (whose trace costs as much as the kernel's) joins on every 10th
case, which together with test_ndiv.py's fixed grid keeps the three-way
kernel == jnp == oracle chain closed without doubling the sweep's
runtime.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ndivplanning_tpu.ops.ndiv import ndiv_loss_reference
from ndivplanning_tpu.ops.ndiv_pallas import (
    _plan,
    _plan_block,
    ndiv_loss_fused,
)
from oracle.torch_oracle import ndiv_loss_torch

_SEED = 20260817


def _random_cases(n: int):
    rng = np.random.default_rng(_SEED)
    out = []
    for _ in range(n):
        out.append((int(rng.integers(1, 65)),   # batch
                    int(rng.integers(2, 65)),   # k
                    int(rng.integers(1, 17)),   # dz
                    int(rng.integers(1, 129)),  # dx
                    float(rng.choice([0.5, 0.8, 1.0]))))
    return out


def _boundary_cases():
    """Deliberate hits on the padding seams of both kernel layouts."""
    cases = []
    # Sublane seams: k just below / at / above each 8-row boundary.
    for k in (7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64):
        cases.append((3, k, 2, 64, 0.8))
    # Row-tile batch seams for the block layout (tb = 1024 // kp): batch
    # exactly at tb-1 / tb / tb+1 exercises zero-padded tail conditions
    # vs an exact grid.  Use k=33 (kp=40, tb=25) so the seam sits inside
    # the fuzz's batch range, plus k=64 (kp=64, tb=16).
    for k in (33, 64):
        kp, tb, _, _, _ = _plan_block(1, k)
        for b in (tb - 1, tb, tb + 1):
            cases.append((b, k, 3, 17, 0.8))
    # Packed-layout seams (tb = 256 // kp): k=24 -> kp=24, tb=10.
    for k in (24,):
        kp, tb, _, _, _ = _plan(1, k)
        for b in (tb - 1, tb, tb + 1):
            cases.append((b, k, 2, 8, 0.8))
    return cases


def _inputs(case_idx: int, b: int, k: int, dz: int, dx: int):
    rng = np.random.default_rng(_SEED + case_idx)
    z = rng.normal(size=(b, k, dz)).astype(np.float32)
    x = rng.normal(size=(b, k, dx)).astype(np.float32)
    # Sprinkle exact duplicates into a third of the cases so zero
    # distances / zero row sums (the subgradient guards) get fuzzed too.
    if case_idx % 3 == 0 and k >= 3:
        z[:, 1] = z[:, 0]
        x[:, 2] = x[:, 0]
    return z, x


_CASES = _random_cases(80) + _boundary_cases()


def test_fuzz_value_parity():
    for idx, (b, k, dz, dx, alpha) in enumerate(_CASES):
        z, x = _inputs(idx, b, k, dz, dx)
        err = f"case {idx}: b={b} k={k} dz={dz} dx={dx} a={alpha}"
        want = float(ndiv_loss_torch(torch.from_numpy(z),
                                     torch.from_numpy(x), alpha))
        got = float(ndiv_loss_fused(jnp.asarray(z), jnp.asarray(x), alpha))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=err)
        if idx % 10 == 0:
            # Close the three-way chain: jnp reference joins the sweep.
            ref = float(ndiv_loss_reference(jnp.asarray(z),
                                            jnp.asarray(x), alpha))
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                       err_msg=err + " (vs jnp)")
        if idx % 7 == 0:
            # Packed-layout kernel variant on every 7th case.
            packed = float(ndiv_loss_fused(jnp.asarray(z), jnp.asarray(x),
                                           alpha, variant="packed"))
            np.testing.assert_allclose(packed, want, rtol=1e-4, atol=1e-5,
                                       err_msg=err + " (packed)")


def test_fuzz_grad_parity():
    # Kernel-vs-oracle gradients on a deterministic subset (every 8th
    # case: 10 random + boundary coverage) — each distinct shape costs a
    # ~1.6 s interpret-mode backward trace, so the subset keeps the sweep
    # inside the suite budget; test_ndiv_pallas.py holds the fixed-grid
    # kernel-vs-jnp gradient parity.
    for idx, (b, k, dz, dx, alpha) in list(enumerate(_CASES))[::8]:
        z, x = _inputs(idx, b, k, dz, dx)
        ker_gz, ker_gx = jax.grad(
            lambda zz, xx: ndiv_loss_fused(zz, xx, alpha),
            argnums=(0, 1))(jnp.asarray(z), jnp.asarray(x))
        err = f"case {idx}: b={b} k={k} dz={dz} dx={dx} a={alpha}"

        tz = torch.from_numpy(z).requires_grad_(True)
        tx = torch.from_numpy(x).requires_grad_(True)
        ndiv_loss_torch(tz, tx, alpha).backward()
        np.testing.assert_allclose(np.asarray(ker_gz), tz.grad.numpy(),
                                   rtol=1e-4, atol=1e-5, err_msg=err)
        np.testing.assert_allclose(np.asarray(ker_gx), tx.grad.numpy(),
                                   rtol=1e-4, atol=1e-5, err_msg=err)
