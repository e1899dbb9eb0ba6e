"""Train-step throughput across generator families × compute dtypes.

The MLP family is dispatch-bound at goalcond scale (sub-ms steps); the
transformer family is roughly COMPUTE-bound at f32 (~200 GFLOP/step,
~15 ms — CLAUDE.md round-3 gotchas), so ``compute_dtype="bf16"`` is the
lever that matters for it: the MXU's bf16 peak is ~4x the f32 path.
This harness measures sustained chunked steps/s for each
(g_arch, compute_dtype) point on one preset and writes
benchmarks/generator_family_results.json.

    python benchmarks/generator_family_bench.py [preset] [chunk] [reps]

Defaults: goalcond, 200-step chunks (~3 s worst case at 67 steps/s —
far under the ~1-minute execution ceiling that crashes the axon
worker), 3 timed reps.  One compiled program per point; 4 points.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

POINTS = (
    {"g_arch": "mlp", "compute_dtype": "f32"},
    {"g_arch": "mlp", "compute_dtype": "bf16"},
    {"g_arch": "transformer", "compute_dtype": "f32"},
    {"g_arch": "transformer", "compute_dtype": "bf16"},
)


def measure(preset: str, chunk: int, reps: int) -> dict:
    import jax

    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_chunk
    from ndivplanning_tpu.utils.config import get_config

    rows = []
    for point in POINTS:
        cfg = get_config(preset, steps=chunk * (reps + 1), **point)
        state = create_train_state(cfg)
        t0 = time.perf_counter()
        state, m = train_chunk(cfg, state, chunk)
        np.asarray(m["d_loss"])  # honest sync: block_until_ready lies here
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state, m = train_chunk(cfg, state, chunk)
            np.asarray(m["d_loss"])
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        rows.append({**point,
                     "steps_per_sec": round(chunk / dt, 1),
                     "ms_per_step": round(1e3 * dt / chunk, 3),
                     "compile_s": round(compile_s, 1),
                     "d_loss_final": round(float(np.asarray(m["d_loss"])[-1]), 4)})
        print(json.dumps(rows[-1]), flush=True)
    return {"backend": jax.default_backend(), "preset": preset,
            "chunk": chunk, "rows": rows}


def main() -> None:
    preset = sys.argv[1] if len(sys.argv) > 1 else "goalcond"
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    out = measure(preset, chunk, reps)
    path = os.path.join(os.path.dirname(__file__),
                        "generator_family_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
