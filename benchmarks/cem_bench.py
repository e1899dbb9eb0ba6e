"""CEM refinement vs one-shot planning at equal rollout budget.

Trains a preset briefly on-device (train_chunk), then plans every scene
of the frozen eval suite two ways with the SAME total rollout budget
(n_candidates one-shot vs n_candidates/(cem_iters+1) per CEM population,
counting the final selection population) and
compares goal-reach rate and mean best score.

    python benchmarks/cem_bench.py [train_steps] [n_scenes] [presets...]

Writes benchmarks/cem_results.json.  Program count per preset: one
train_chunk, one plan_batch, one plan_cem_batch (TPU remote-compile
budget: 3 programs).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def run(preset: str, train_steps: int, n_scenes: int,
        with_grad: bool = False) -> dict:
    from ndivplanning_tpu.planning.cem import plan_cem_batch
    from ndivplanning_tpu.planning.planner import plan_batch
    from ndivplanning_tpu.train.evaluate import make_eval_suite
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_chunk
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config(preset, dp_shards=1, div_shards=1)
    state = create_train_state(cfg)
    t0 = time.monotonic()
    if train_steps:
        state, _ = train_chunk(cfg, state, train_steps)
    t_train = time.monotonic() - t0

    suite = make_eval_suite(cfg, n_scenes)
    keys = jax.random.split(jax.random.PRNGKey(0xCE9), n_scenes)

    def summarize(result):
        reached = np.asarray(result.best_reached, np.float64)
        scores = np.asarray(result.best_score, np.float64)
        return {"reach_rate": round(float(reached.mean()), 4),
                "mean_best_score": round(float(scores.mean()), 4)}

    t0 = time.monotonic()
    oneshot = plan_batch(cfg, state, suite.scenes, suite.conditions, keys)
    one = summarize(oneshot)
    t_one = time.monotonic() - t0

    t0 = time.monotonic()
    refined, curves = plan_cem_batch(cfg, state, suite.scenes,
                                     suite.conditions, keys)
    cem = summarize(refined)
    t_cem = time.monotonic() - t0

    grad = None
    t_grad = 0.0
    if with_grad:
        from ndivplanning_tpu.planning.grad_refine import plan_grad_batch

        t0 = time.monotonic()
        refined_g, _ = plan_grad_batch(cfg, state, suite.scenes,
                                       suite.conditions, keys)
        grad = summarize(refined_g)
        t_grad = time.monotonic() - t0

    mean_curve = [round(float(c), 4)
                  for c in np.asarray(curves, np.float64).mean(axis=0)]
    out = {
        "preset": preset, "train_steps": train_steps, "n_scenes": n_scenes,
        "budget_rollouts_per_scene": cfg.n_candidates,
        "cem_iters": cfg.cem_iters,
        "oneshot": one, "cem": cem, "grad": grad,
        "cem_mean_best_curve": mean_curve,
        "wall_s": {"train": round(t_train, 1),
                   "plan_oneshot": round(t_one, 1),
                   "plan_cem": round(t_cem, 1),
                   "plan_grad": round(t_grad, 1)},
        "backend": jax.default_backend(),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    train_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_scenes = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    with_grad = "--grad" in sys.argv
    presets = [a for a in sys.argv[3:] if not a.startswith("--")] or [
        "goalcond", "planning"]
    results = [run(p, train_steps, n_scenes, with_grad) for p in presets]
    path = os.environ.get("CEM_BENCH_OUT") or os.path.join(
        os.path.dirname(__file__), "cem_results.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
