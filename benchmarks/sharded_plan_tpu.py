"""Compile + time the candidate-sharded plan program on the real chip.

The virtual-mesh tests pin semantics; this records that the
`make_sharded_plan` program (with its with_sharding_constraint layout)
compiles and runs through the production TPU toolchain, and what the
single-scene latency looks like vs the unsharded `plan` at the flagship
candidate count.  On the one-chip dev box the mesh is 1x1, so the
interesting quantity is overhead-of-the-constraints (should be ~0: same
program).  Honest timing: every measurement ends in a device_get
(CLAUDE.md — block_until_ready lies through the axon tunnel).

Writes benchmarks/sharded_plan_tpu.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _time_calls(fn, reps: int) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn()
        np.asarray(out)  # honest sync
        ts.append(time.monotonic() - t0)
    return float(np.median(ts))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.parallel.mesh import make_mesh
    from ndivplanning_tpu.parallel.sharded_plan import make_sharded_plan
    from ndivplanning_tpu.parallel.sharded_step import shard_state
    from ndivplanning_tpu.planning.planner import plan
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils.config import get_config

    backend = jax.devices()[0].platform
    n_dev = len(jax.devices())
    cfg = get_config("planning", dp_shards=n_dev, div_shards=1)
    state = create_train_state(cfg)
    mesh = make_mesh(dp=n_dev, div=1)
    state_r = shard_state(state, mesh)
    scene = random_scene(jax.random.PRNGKey(0))
    # planning preset conditions on the rasterised scene image.
    from ndivplanning_tpu.planning.server import _condition_for

    cond = _condition_for(cfg, scene)
    key = jax.random.PRNGKey(1)
    n = cfg.n_candidates

    plan_fn, _ = make_sharded_plan(cfg, mesh, n_candidates=n, n_diverse=8)

    t0 = time.monotonic()
    sharded = plan_fn(state_r, scene, cond, key)
    np.asarray(sharded.best_score)
    compile_s = time.monotonic() - t0

    t0 = time.monotonic()
    base = plan(cfg, state, scene, cond, key, n_candidates=n, n_diverse=8)
    np.asarray(base.best_score)
    compile_unsharded_s = time.monotonic() - t0

    lat_sharded = _time_calls(
        lambda: plan_fn(state_r, scene, cond, key).best_score, 20)
    lat_base = _time_calls(
        lambda: plan(cfg, state, scene, cond, key, n_candidates=n,
                     n_diverse=8).best_score, 20)

    parity = abs(float(sharded.best_score) - float(base.best_score))

    # The refinement planners' sharded programs: compile + one honest
    # call each (CEM is the measured-best planning mode — its pod
    # latency path must be TPU-compile-proven too).
    from ndivplanning_tpu.parallel.sharded_plan import (
        make_sharded_cem,
        make_sharded_grad,
    )

    cem_fn, _ = make_sharded_cem(cfg, mesh)
    t0 = time.monotonic()
    cem_out, _curve = cem_fn(state_r, scene, cond, key)
    np.asarray(cem_out.best_score)
    cem_compile_s = time.monotonic() - t0
    cem_lat = _time_calls(
        lambda: cem_fn(state_r, scene, cond, key)[0].best_score, 10)

    grad_fn, _ = make_sharded_grad(cfg, mesh)
    t0 = time.monotonic()
    grad_out, _curve = grad_fn(state_r, scene, cond, key)
    np.asarray(grad_out.best_score)
    grad_compile_s = time.monotonic() - t0
    grad_lat = _time_calls(
        lambda: grad_fn(state_r, scene, cond, key)[0].best_score, 10)

    from ndivplanning_tpu.parallel.sharded_plan import make_sharded_trajopt

    trj_fn, _ = make_sharded_trajopt(cfg, mesh)
    t0 = time.monotonic()
    trj_out, _curve = trj_fn(state_r, scene, cond, key)
    np.asarray(trj_out.best_score)
    trj_compile_s = time.monotonic() - t0
    trj_lat = _time_calls(
        lambda: trj_fn(state_r, scene, cond, key)[0].best_score, 10)

    from ndivplanning_tpu.parallel.sharded_plan import (
        make_sharded_cem_trajopt,
        make_sharded_ilqr,
    )

    ilqr_fn, _ = make_sharded_ilqr(cfg, mesh)
    t0 = time.monotonic()
    ilqr_out, _curve = ilqr_fn(state_r, scene, cond, key)
    np.asarray(ilqr_out.best_score)
    ilqr_compile_s = time.monotonic() - t0
    ilqr_lat = _time_calls(
        lambda: ilqr_fn(state_r, scene, cond, key)[0].best_score, 5)

    hy_fn, _ = make_sharded_cem_trajopt(cfg, mesh)
    t0 = time.monotonic()
    hy_out, _curve = hy_fn(state_r, scene, cond, key)
    np.asarray(hy_out.best_score)
    hy_compile_s = time.monotonic() - t0
    hy_lat = _time_calls(
        lambda: hy_fn(state_r, scene, cond, key)[0].best_score, 5)

    row = {
        "backend": backend,
        "mesh": f"{n_dev}x1",
        "n_candidates": n,
        "compile_s_sharded": round(compile_s, 2),
        "compile_s_unsharded": round(compile_unsharded_s, 2),
        "latency_ms_sharded": round(lat_sharded * 1e3, 3),
        "latency_ms_unsharded": round(lat_base * 1e3, 3),
        "best_score_abs_diff": parity,
        "cem_compile_s": round(cem_compile_s, 2),
        "cem_latency_ms": round(cem_lat * 1e3, 3),
        "grad_compile_s": round(grad_compile_s, 2),
        "grad_latency_ms": round(grad_lat * 1e3, 3),
        "trajopt_compile_s": round(trj_compile_s, 2),
        "trajopt_latency_ms": round(trj_lat * 1e3, 3),
        "ilqr_compile_s": round(ilqr_compile_s, 2),
        "ilqr_latency_ms": round(ilqr_lat * 1e3, 3),
        "cem_trajopt_compile_s": round(hy_compile_s, 2),
        "cem_trajopt_latency_ms": round(hy_lat * 1e3, 3),
    }
    print(json.dumps(row))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "sharded_plan_tpu.json"), "w") as f:
        json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
