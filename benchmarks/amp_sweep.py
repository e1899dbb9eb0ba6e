"""Sweep device-side amplification factors for the bench workloads.

bench.py amortises the tunnel's ~35 ms dispatch overhead by running AMP
independent copies of the CPU-scale workload per dispatch.  This sweep
measures sustained throughput vs AMP to pick the knee of the curve (past
it, bigger batches stop helping and only add compile time / memory).

    python benchmarks/amp_sweep.py

Writes benchmarks/amp_sweep_results.json.  One compiled program per
(workload, AMP) point — keep the grid small on the TPU tunnel.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def _time_it(fn, n_iters=2, warmup=2):
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            fn()
        times.append((time.perf_counter() - t0) / n_iters)
    return float(np.median(times))


def sweep_rollout(amps) -> list[dict]:
    from ndivplanning_tpu.envs.rollout import score_candidates
    from ndivplanning_tpu.envs.types import EnvParams, Scene

    key = jax.random.PRNGKey(0)
    params = EnvParams.create()
    scene = Scene.create([0.1, 0.1], [0.9, 0.9], [[0.5, 0.5, 0.1]])
    rows = []
    for amp in amps:
        n = 1000 * amp
        taus = jax.random.uniform(key, (n, 32, 2))

        def roll():
            scores = score_candidates(params, scene, taus).score
            np.asarray(scores[0])  # honest sync

        t = _time_it(roll)
        rows.append({"amp": amp, "steps_per_sec": round(n * 32 / t, 1),
                     "dispatch_s": round(t, 4)})
        print(json.dumps({"workload": "rollout", **rows[-1]}), flush=True)
    return rows


def sweep_ndiv(amps) -> list[dict]:
    from ndivplanning_tpu.ops.ndiv import ndiv_loss

    key = jax.random.PRNGKey(0)
    grad_fn = jax.jit(jax.grad(lambda z, x: ndiv_loss(z, x),
                               argnums=(0, 1)))
    rows = []
    for amp in amps:
        b = 256 * amp
        z = jax.random.normal(key, (b, 32, 2))
        x = jax.random.normal(key, (b, 32, 64))

        def fwd_bwd():
            gz, gx = grad_fn(z, x)
            np.asarray(gx[0, 0, 0])

        t = _time_it(fwd_bwd)
        pairs = b * 32 * 31
        rows.append({"amp": amp, "pairs_per_sec": round(pairs / t, 1),
                     "dispatch_s": round(t, 4)})
        print(json.dumps({"workload": "ndiv", **rows[-1]}), flush=True)
    return rows


def main() -> None:
    out = {
        "backend": jax.default_backend(),
        "rollout": sweep_rollout([16, 64, 128]),
        "ndiv": sweep_ndiv([64, 192]),
    }
    path = os.path.join(os.path.dirname(__file__), "amp_sweep_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
