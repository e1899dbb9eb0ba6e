"""Convergence demo: train real presets on the live backend and record
before/after eval metrics (C10) — evidence the NDiv-GAN learns diverse,
goal-reaching trajectories, committed as benchmarks/convergence_results.json.

Usage: python benchmarks/convergence_demo.py [steps] [presets...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def run(preset: str, steps: int) -> dict:
    import numpy as np

    from ndivplanning_tpu.train.evaluate import evaluate
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_chunk
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config(preset, dp_shards=1, div_shards=1)
    state = create_train_state(cfg)
    key = jax.random.PRNGKey(cfg.seed + 100)

    before = {k: float(v) for k, v in evaluate(cfg, state, key).items()}
    chunk = max(steps // 10, 1)
    state, m = train_chunk(cfg, state, chunk)  # compile outside the clock
    np.asarray(m["g_ndiv"][-1])
    done = chunk
    curve = [{"step": done, **{k: float(v[-1]) for k, v in m.items()}}]
    t0 = time.monotonic()
    while done < steps:
        n = min(chunk, steps - done)
        state, m = train_chunk(cfg, state, n)
        done += n
        curve.append({"step": done, **{k: float(v[-1]) for k, v in m.items()}})
    np.asarray(m["g_ndiv"][-1])
    wall = time.monotonic() - t0
    after = {k: float(v) for k, v in evaluate(cfg, state, key).items()}
    timed_steps = max(done - chunk, 1)  # first chunk paid the compile
    return {
        "preset": preset,
        "steps": steps,
        "wall_s": round(wall, 2),
        "steps_per_sec": round(timed_steps / wall, 2),
        "backend": jax.default_backend(),
        "before": before,
        "after": after,
        "loss_curve": curve,
    }


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    presets = sys.argv[2:] or ["pointmass2d", "goalcond", "imagecond"]
    results = [run(p, steps) for p in presets]
    out = os.path.join(os.path.dirname(__file__), "convergence_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    for r in results:
        print(f"{r['preset']}: {r['steps_per_sec']} steps/s | "
              f"pairwise_dist {r['before']['eval_mean_pairwise_dist']:.4f}"
              f"->{r['after']['eval_mean_pairwise_dist']:.4f} | "
              f"endpoint_err {r['before']['eval_endpoint_err']:.4f}"
              f"->{r['after']['eval_endpoint_err']:.4f} | "
              f"success {r['before']['eval_success_rate']:.3f}"
              f"->{r['after']['eval_success_rate']:.3f}")


if __name__ == "__main__":
    main()
