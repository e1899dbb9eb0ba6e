"""Rollout-engine throughput per environment family.

    python benchmarks/env_family_bench.py [n_candidates] [n_iters]

One `score_candidates` program per family (vmap(lax.scan), waypoint
mode — the planner's exact hot path), timed with an honest device fetch
(CLAUDE.md: `block_until_ready` lies through the axon tunnel).  Prints
one JSON line: env steps/s and candidate plans/s per family, so the
cost of each family's dynamics (pointmass: linear algebra only;
unicycle: trig heading; reacher: FK + link collision; quadrotor:
attitude dynamics + thrust vectoring) is on the record next to the
quality rows in BASELINE.md.

Set ENV_FAMILY_BENCH_CPU=1 to force the CPU backend.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("ENV_FAMILY_BENCH_CPU"):
    jax.config.update("jax_platforms", "cpu")
    import jax.extend.backend

    jax.extend.backend.clear_backends()

import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.envs.registry import get_env
from ndivplanning_tpu.envs.rollout import score_candidates
from ndivplanning_tpu.envs.types import Scene

FAMILIES = ("pointmass", "unicycle", "reacher", "quadrotor")
HORIZON = 32


def bench_family(env: str, n_candidates: int, n_iters: int) -> dict:
    params = get_env(env).make_params()
    scene = Scene.create([0.1, 0.1], [0.9, 0.9], [[0.5, 0.5, 0.1]])
    taus = jax.random.uniform(
        jax.random.PRNGKey(0), (n_candidates, HORIZON, 2), jnp.float32)

    def run():
        res = score_candidates(params, scene, taus, env=env)
        # Honest sync: a real device_get of an output element.
        return float(np.asarray(res.score[0]))

    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iters):
        run()
    dt = (time.perf_counter() - t0) / n_iters
    return {
        "env": env,
        "compile_s": round(compile_s, 2),
        "steps_per_s": round(n_candidates * HORIZON / dt),
        "plans_per_s": round(n_candidates / dt),
        "ms_per_call": round(dt * 1e3, 3),
    }


def main() -> None:
    n_candidates = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rows = [bench_family(env, n_candidates, n_iters) for env in FAMILIES]
    print(json.dumps({
        "backend": jax.default_backend(),
        "n_candidates": n_candidates,
        "horizon": HORIZON,
        "families": rows,
    }))


if __name__ == "__main__":
    main()
