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
    import jax.numpy as jnp

    from ndivplanning_tpu.ops.ndiv import ndiv_loss_reference
    from ndivplanning_tpu.ops.ndiv_pallas import ndiv_loss_fused

    REPS = 200  # scan-on-device repetitions per dispatch (pure compute)
    shapes = [  # (B, k, dz, dx)
        (256, 8, 2, 64),  # goalcond-like
        (256, 32, 2, 64),  # pod_dp-like
    ]
    results = []
    for b, k, dz, dx in shapes:
        key = jax.random.PRNGKey(0)
        z = jax.random.normal(key, (b, k, dz))
        x = jax.random.normal(key, (b, k, dx))
        row = {"B": b, "k": k, "dz": dz, "dx": dx, "reps": REPS,
               "backend": jax.default_backend()}
        # "pallas" = shipped default (block); "pallas_group" = the
        # round-4 group-packed decomposition (g = 128//kp sample-blocks
        # fused per full-lane Gram tile — the 'different decomposition'
        # named by the round-3 tile-sweep closure).
        for name, impl in [
            ("pallas", ndiv_loss_fused),
            ("pallas_group",
             lambda zz, xx, a: ndiv_loss_fused(zz, xx, a,
                                               variant="group")),
            ("jnp", ndiv_loss_reference),
        ]:
            # lax.scan the VALUE+grad computation REPS times with
            # per-iteration perturbed inputs (defeats CSE), accumulating
            # value and grad sums; one dispatch + one fetch measures pure
            # sustained compute.  value_and_grad with the VALUE consumed
            # matters: under plain jax.grad the old two-kernel scheme's
            # forward pallas_call had no live output and XLA dead-code
            # -eliminated it, so "fwdbwd" silently measured backward-only
            # for the kernel (while the jnp column still paid most of its
            # forward as backward residual computation).
            def gsum(zz, xx, i=impl):
                g = jax.value_and_grad(lambda a, bb: i(a, bb, 0.8),
                                       argnums=(0, 1))

                def body(c, r):
                    v, (gz, gx) = g(zz + r * 1e-12, xx)
                    return c + v + gx[0, 0, 0] + gz[0, 0, 0], None

                init = jnp.float32(0.0)
                out, _ = jax.lax.scan(
                    body, init, jnp.arange(REPS, dtype=jnp.float32))
                return out

            fn = jax.jit(gsum)
            t = measure(lambda: np.asarray(fn(z, x)), REPS)
            pairs = b * k * k
            row[f"{name}_fwdbwd_us"] = round(t * 1e6, 2)
            row[f"{name}_pairs_per_sec"] = round(pairs / t, 1)
        row["speedup_fwdbwd"] = round(
            row["jnp_fwdbwd_us"] / row["pallas_fwdbwd_us"], 2)
        row["group_speedup_fwdbwd"] = round(
            row["jnp_fwdbwd_us"] / row["pallas_group_fwdbwd_us"], 2)
        row["group_vs_block"] = round(
            row["pallas_fwdbwd_us"] / row["pallas_group_fwdbwd_us"], 2)
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(__file__), "ndiv_kernel_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
