"""Direct trajectory optimisation vs one-shot / latent refiners, suite
scale, on the VENDORED trained checkpoints.

The motivating question (BASELINE.md round 3): the quadrotor family's
one-shot ceiling is set by dynamic feasibility — G's waypoint draws are
rarely sequences the thrust-vectored dynamics can track.  The latent
refiners search inside G's manifold, so they inherit that cap; direct
tau optimisation (planning/trajopt.py) escapes it while keeping the
honest union selection.  This measures all three planner families over
the frozen suite on (a) checkpoints/quadrotor150k (hard dynamics) and
(b) checkpoints/planning512 (easy dynamics, image-conditioned, already
0.833 one-shot) — does trajopt help where the manifold is the cap, and
does it at least not hurt where it is not?

    python benchmarks/trajopt_bench.py [n_scenes]

Writes benchmarks/trajopt_results.json (override with TRAJOPT_OUT; pass
extra argv entries as vendored-checkpoint names or workdir paths).
Program budget: 5 planner programs per checkpoint (one-shot / CEM /
grad / trajopt at the grad-matched 12-step budget / trajopt at the
shipped 60-step default).  Honest timing: every measurement ends in a
device fetch.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(workdir: str, n_scenes: int) -> dict:
    from ndivplanning_tpu.planning.cem import plan_cem_batch
    from ndivplanning_tpu.planning.planner import plan_batch
    from ndivplanning_tpu.planning.trajopt import plan_trajopt_batch
    from ndivplanning_tpu.train.evaluate import make_eval_suite
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt
    from ndivplanning_tpu.utils.config import load_config

    cfg = load_config(workdir)
    state = create_train_state(cfg)
    best = ckpt.restore_latest(os.path.join(workdir, "best"), state)
    assert best is not None, f"no best checkpoint under {workdir}"
    state = best

    suite = make_eval_suite(cfg, n_scenes)
    keys = jax.random.split(jax.random.PRNGKey(0x7A10), n_scenes)

    def summarize(result, t):
        reached = np.asarray(result.best_reached, np.float64)
        scores = np.asarray(result.best_score, np.float64)
        return {"reach_rate": round(float(reached.mean()), 4),
                "mean_best_score": round(float(scores.mean()), 4),
                "wall_s": round(t, 1)}

    out = {"workdir": os.path.basename(workdir), "preset": cfg.name,
           "env": cfg.env, "n_scenes": n_scenes,
           "step": int(state.step), "backend": jax.default_backend()}

    t0 = time.monotonic()
    r = plan_batch(cfg, state, suite.scenes, suite.conditions, keys)
    np.asarray(r.best_score)
    out["oneshot"] = summarize(r, time.monotonic() - t0)

    t0 = time.monotonic()
    r, _ = plan_cem_batch(cfg, state, suite.scenes, suite.conditions, keys)
    np.asarray(r.best_score)
    out["cem"] = summarize(r, time.monotonic() - t0)

    # Grad-budget-matched trajopt (12 steps, lr 0.02 — the latent grad
    # refiner's budget, NOT the config default, which is the stronger
    # 60/0.05 measured in r3j and now the shipped default).
    t0 = time.monotonic()
    r, _ = plan_trajopt_batch(cfg, state, suite.scenes, suite.conditions,
                              keys, n_steps=12, lr=0.02)
    np.asarray(r.best_score)
    out["trajopt12"] = summarize(r, time.monotonic() - t0)

    # Matched latent counterpart: same Adam-on-soft-objective budget but
    # searching z through G — separates "tau-space beats latent-space"
    # from "gradient refinement beats sampling".
    from ndivplanning_tpu.planning.grad_refine import plan_grad_batch

    t0 = time.monotonic()
    r, _ = plan_grad_batch(cfg, state, suite.scenes, suite.conditions, keys)
    np.asarray(r.best_score)
    out["grad"] = summarize(r, time.monotonic() - t0)

    # The shipped default budget (cfg.trajopt_steps=60, trajopt_lr=0.05).
    t0 = time.monotonic()
    r, _ = plan_trajopt_batch(cfg, state, suite.scenes, suite.conditions,
                              keys, n_steps=60, lr=0.05)
    np.asarray(r.best_score)
    out["trajopt60"] = summarize(r, time.monotonic() - t0)

    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    # Targets: vendored checkpoint names or absolute workdir paths.
    targets = sys.argv[2:] or ["quadrotor150k", "planning512"]
    out_path = os.environ.get(
        "TRAJOPT_OUT",
        os.path.join(os.path.dirname(__file__), "trajopt_results.json"))
    results = []
    for name in targets:
        wd = name if os.path.isdir(name) else os.path.join(
            REPO, "checkpoints", name)
        if os.path.isdir(wd):
            results.append(run(wd, n_scenes))
        # Crash-safe partial write (a TPU-worker restart on target 2 must
        # not lose target 1 — the convergence harness learned this).
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
