"""Imagecond quality sweep (VERDICT round-1 #8).

The conv-conditioned config is the weak learner (52.3% rollout success
at 50k vs goalcond's 66.8%).  Train short runs of candidate recipes —
feature matching, encoder capacity, learning-rate splits — across
multiple seeds (GAN seed variance is large) and score every run on the
FROZEN eval suite so numbers are comparable.

    python benchmarks/imagecond_sweep.py [steps] [seeds]

Writes benchmarks/imagecond_sweep_results.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


VARIANTS = {
    "control": {},
    "fm1": {"feature_matching_weight": 1.0},
    "fm1_bigenc": {"feature_matching_weight": 1.0,
                   "encoder_features": (32, 64, 128)},
    "bigenc": {"encoder_features": (32, 64, 128)},
    "ttur": {"d_lr": 2e-3, "g_lr": 5e-4},
    "fm1_ttur": {"feature_matching_weight": 1.0, "d_lr": 2e-3,
                 "g_lr": 5e-4},
    # EMA generator: the standard stabiliser for the measured 0.06-0.73
    # success oscillation (convergence_fixed_results.json).
    "ema99": {"g_ema_decay": 0.99},
    "ema999": {"g_ema_decay": 0.999},
    "ema999_bigenc": {"g_ema_decay": 0.999,
                      "encoder_features": (32, 64, 128)},
    # R1 gradient penalty (Mescheder et al. 2018): targets the measured
    # late-soak D-overpowers-G collapse (g_ndiv -> 0 past ~45k steps) —
    # its effect shows mainly in 50k soaks (convergence_fixed.py with
    # {"r1_weight": ...} overrides), but the short-horizon cost/benefit
    # belongs in this sweep for completeness.
    "r1_01": {"r1_weight": 0.1},
    "r1_1": {"r1_weight": 1.0},
    "ema999_r1_01": {"g_ema_decay": 0.999, "r1_weight": 0.1},
}


CHUNK = 3000  # fixed scan length: one compiled program per variant
               # regardless of total steps


def run_variant(name: str, overrides: dict, steps: int, seeds: int) -> dict:
    from ndivplanning_tpu.train.evaluate import evaluate_fixed
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_chunk
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config("imagecond", dp_shards=1, div_shards=1, **overrides)
    rows = []
    t0 = time.monotonic()
    for seed in range(seeds):
        state = create_train_state(cfg, seed=seed)
        done = 0
        while done < steps:
            n = min(CHUNK, steps - done)
            state, m = train_chunk(cfg, state, n)
            done += n
        np.asarray(m["g_ndiv"][-1])  # honest sync
        ev = {k: float(v) for k, v in
              evaluate_fixed(cfg, state, n_scenes=256).items()}
        rows.append({"seed": seed, **ev})
    succ = [r["eval_success_rate"] for r in rows]
    out = {
        "variant": name,
        "overrides": {k: str(v) for k, v in overrides.items()},
        "steps": steps,
        "wall_s": round(time.monotonic() - t0, 1),
        "success_mean": round(float(np.mean(succ)), 4),
        "success_min": round(float(np.min(succ)), 4),
        "success_max": round(float(np.max(succ)), 4),
        "collision_mean": round(float(np.mean(
            [r["eval_collision_rate"] for r in rows])), 4),
        "diversity_mean": round(float(np.mean(
            [r["eval_mean_pairwise_dist"] for r in rows])), 4),
        "runs": rows,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}),
          flush=True)
    return out


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    seeds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    variants = {n: o for n, o in VARIANTS.items()
                if only is None or n in only}
    results = [run_variant(n, o, steps, seeds) for n, o in variants.items()]
    path = os.path.join(os.path.dirname(__file__),
                        f"imagecond_sweep_results_{steps}.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
