"""Compile + run the PRODUCTION multi-chip train step on real TPU.

Round-2 verdict gap #1: every multi-chip artifact so far ran the fused
Pallas kernel in interpret mode on virtual CPU devices — the
pallas-inside-shard_map program (parallel/sharded_step.py, the
``check_vma=False`` region) had never been compiled by Mosaic on actual
TPU hardware.  This benchmark closes that: it builds
``make_sharded_train_step`` over a REAL 1x1 device mesh with
``ndiv_impl="pallas"`` — since round 3, a mesh handle engages the
all_gather + fused-kernel + psum shard_map path regardless of shard
count (train/step.py::_ndiv), so the compiled program has the exact
structure of the N-chip deployment (the size-1 collectives fold away,
the Mosaic kernel compile and the shard_map manual-partitioning region
do not).

Also measures the same config through the unsharded ``train_chunk``
(plain fused kernel under GSPMD jit) so BASELINE.md can record the
sharded-vs-unsharded steps/s ratio.

Honest methodology (CLAUDE.md): timing ends with a device_get of a
metric element; chunked scans amortise the ~35 ms tunnel dispatch.

Usage: python benchmarks/sharded_tpu_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

CHUNK = 50  # steps per compiled scan
REPS = 5  # timed dispatches (median)


def _run(step_fn, state):
    """One dispatch + honest fetch; returns (state, seconds)."""
    t0 = time.perf_counter()
    state, metrics = step_fn(state)
    np.asarray(jax.device_get(metrics["g_total"]))[-1]
    return state, time.perf_counter() - t0


def main():
    from ndivplanning_tpu.parallel.mesh import make_mesh
    from ndivplanning_tpu.parallel.sharded_step import (
        make_sharded_train_step,
        shard_state,
    )
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_chunk
    from ndivplanning_tpu.utils.config import get_config

    backend = jax.default_backend()
    # The pod_dp workload's PER-CHIP shard (global batch 8192 over 8
    # chips -> 1024 per chip, k=32, bf16): the program one deployed chip
    # actually runs.
    cfg = get_config(
        "pod_dp",
        dp_shards=1,
        div_shards=1,
        batch_size=1024,
        k=32,
        ndiv_impl="pallas",
        workdir="",
    )

    row = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "config": "pod_dp per-chip shard (batch 1024, k=32, bf16)",
        "mesh": "1x1 (dp x div)",
        "chunk": CHUNK,
        "kernel_mode": ("mosaic-compiled" if backend == "tpu"
                        else "interpret (NOT hardware evidence)"),
    }

    results = {}
    for name, build in [
        ("sharded", None),
        ("unsharded", None),
    ]:
        if name == "sharded":
            mesh = make_mesh(dp=1, div=1)
            step_fn, mesh = make_sharded_train_step(cfg, mesh, chunk=CHUNK)
            state = shard_state(create_train_state(cfg), mesh)
            fn = step_fn
        else:
            state = create_train_state(cfg)
            fn = lambda s: train_chunk(cfg, s, CHUNK)

        t0 = time.perf_counter()
        state, _ = _run(fn, state)  # compile + first run
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(REPS):
            state, dt = _run(fn, state)
            times.append(dt)
        sec = float(np.median(times))
        results[name] = {
            "compile_s": round(compile_s, 1),
            "steps_per_sec": round(CHUNK / sec, 1),
            "sec_per_chunk": round(sec, 4),
        }
        print(json.dumps({name: results[name]}), flush=True)

    row.update(results)
    row["sharded_vs_unsharded"] = round(
        results["sharded"]["steps_per_sec"]
        / results["unsharded"]["steps_per_sec"], 3)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "sharded_tpu_results.json")
    with open(out, "w", encoding="utf-8") as f:
        json.dump(row, f, indent=1)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
