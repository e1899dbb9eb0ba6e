"""Fused Pallas NDiv kernel vs XLA-fused jnp path, on-device.

Honest methodology (CLAUDE.md): device_get sync, batch-amplified
workloads to amortise the tunnel's fixed dispatch overhead.  Results
recorded in benchmarks/ndiv_kernel_results.json and used to sanity-check
the ``impl="auto"`` dispatch policy in ops/ndiv.py.

Usage: python benchmarks/ndiv_kernel_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def measure(fn, amp: int) -> float:
    """Per-unamplified-call seconds, median of 3 (after 2 warmups)."""
    for _ in range(2):
        fn()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) / amp)
    return float(np.median(times))


def main():
    from ndivplanning_tpu.ops.ndiv import ndiv_loss_reference
    from ndivplanning_tpu.ops.ndiv_pallas import ndiv_loss_fused

    shapes = [  # (B, k, dz, dx, amp)
        (256, 8, 2, 64, 64),  # goalcond-like
        (256, 32, 2, 64, 32),  # pod_dp-like
    ]
    results = []
    for b, k, dz, dx, amp in shapes:
        key = jax.random.PRNGKey(0)
        z = jax.random.normal(key, (b * amp, k, dz))
        x = jax.random.normal(key, (b * amp, k, dx))
        row = {"B": b, "k": k, "dz": dz, "dx": dx,
               "backend": jax.default_backend()}
        for name, impl in [("pallas", ndiv_loss_fused),
                           ("jnp", ndiv_loss_reference)]:
            fwd = jax.jit(lambda zz, xx, i=impl: i(zz, xx, 0.8))
            gfn = jax.jit(jax.grad(lambda zz, xx, i=impl: i(zz, xx, 0.8),
                                   argnums=(0, 1)))
            t_f = measure(lambda: np.asarray(fwd(z, x)), amp)
            t_g = measure(lambda: np.asarray(gfn(z, x)[1][0, 0, 0]), amp)
            pairs = b * k * k
            row[f"{name}_fwd_us"] = round(t_f * 1e6, 2)
            row[f"{name}_fwdbwd_us"] = round(t_g * 1e6, 2)
            row[f"{name}_pairs_per_sec"] = round(pairs / t_g, 1)
        row["speedup_fwdbwd"] = round(
            row["jnp_fwdbwd_us"] / row["pallas_fwdbwd_us"], 2)
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(__file__), "ndiv_kernel_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
