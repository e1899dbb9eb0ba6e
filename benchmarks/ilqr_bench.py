"""Second-order planning study: iLQR and the CEM->trajopt hybrid on the
underactuated quadrotor (VERDICT round-3 #7).

Round-3 verdict: first-order trajopt dominates every kinematic family
but is an honest negative on the quadrotor, where CEM's 0.5321 edges
the one-shot 0.5364 by only 0.8% (r3j) — open-loop planning on the
hardest family was effectively conceded to MPC.  This measures the two
round-4 answers over one frozen suite on checkpoints/quadrotor150k:

- oneshot / cem: the incumbent baselines, re-measured same-suite so the
  comparison is apples-to-apples (r3j's 0.5321 was a different
  scene-count/seed draw);
- ilqr: Riccati-sweep second-order refinement (planning/ilqr.py);
- cem+trajopt: global latent CEM search seeding direct tau refinement
  (planning/trajopt.py::plan_cem_trajopt).

    python benchmarks/ilqr_bench.py [n_scenes] [targets...]

Writes benchmarks/ilqr_results.json (override with ILQR_OUT).  Scenes
are dispatched in CHUNKS (ILQR_CHUNK, default 16): big vmapped planner
programs in one dispatch crashed the TPU worker twice in round 3 (the
>1-minute-dispatch class, CLAUDE.md) — chunking keeps each device call
well under the wall at the cost of re-running the same compiled program
per chunk.  Honest timing: every chunk ends in a device fetch.
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
CHUNK = int(os.environ.get("ILQR_CHUNK", "16"))
# Budget overrides for the r4o sweep (None = config defaults: 62 warm
# starts = n_candidates//16, cfg.ilqr_iters = 12).
ITERS = int(os.environ["ILQR_ITERS"]) if "ILQR_ITERS" in os.environ else None
WARM = int(os.environ["ILQR_WARM"]) if "ILQR_WARM" in os.environ else None


def _take(tree, lo, hi):
    return jax.tree.map(lambda x: x[lo:hi], tree)


def _chunked(fn, suite, keys, n_scenes):
    """Run a batched planner over the suite in CHUNK-scene dispatches,
    concatenating the per-scene outputs host-side."""
    reached, scores = [], []
    t0 = time.monotonic()
    for lo in range(0, n_scenes, CHUNK):
        hi = min(lo + CHUNK, n_scenes)
        r = fn(_take(suite.scenes, lo, hi), _take(suite.conditions, lo, hi),
               keys[lo:hi])
        # Device fetch per chunk = the honest sync point (CLAUDE.md).
        reached.append(np.asarray(r.best_reached, np.float64))
        scores.append(np.asarray(r.best_score, np.float64))
    t = time.monotonic() - t0
    return {"reach_rate": round(float(np.concatenate(reached).mean()), 4),
            "mean_best_score": round(float(np.concatenate(scores).mean()), 4),
            "wall_s": round(t, 1)}


def run(workdir: str, n_scenes: int) -> dict:
    from ndivplanning_tpu.planning.cem import plan_cem_batch
    from ndivplanning_tpu.planning.ilqr import plan_ilqr_batch
    from ndivplanning_tpu.planning.planner import plan_batch
    from ndivplanning_tpu.planning.trajopt import plan_cem_trajopt_batch
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

    out = {"workdir": os.path.basename(workdir), "preset": cfg.name,
           "env": cfg.env, "n_scenes": n_scenes, "chunk": CHUNK,
           "step": int(state.step), "backend": jax.default_backend()}

    out["oneshot"] = _chunked(
        lambda s, c, k: plan_batch(cfg, state, s, c, k),
        suite, keys, n_scenes)
    out["cem"] = _chunked(
        lambda s, c, k: plan_cem_batch(cfg, state, s, c, k)[0],
        suite, keys, n_scenes)
    out["cem_trajopt"] = _chunked(
        lambda s, c, k: plan_cem_trajopt_batch(cfg, state, s, c, k)[0],
        suite, keys, n_scenes)
    out["ilqr_budget"] = {"n_iters": ITERS, "n_warm": WARM}
    out["ilqr"] = _chunked(
        lambda s, c, k: plan_ilqr_batch(cfg, state, s, c, k,
                                        n_candidates=WARM,
                                        n_iters=ITERS)[0],
        suite, keys, n_scenes)

    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    n_scenes = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    targets = sys.argv[2:] or ["quadrotor150k"]
    out_path = os.environ.get(
        "ILQR_OUT", os.path.join(os.path.dirname(__file__),
                                 "ilqr_results.json"))
    results = []
    for name in targets:
        wd = name if os.path.isdir(name) else os.path.join(
            REPO, "checkpoints", name)
        if os.path.isdir(wd):
            results.append(run(wd, n_scenes))
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()


# Reference anchor (BASELINE.md r3j, 256 scenes, different draw):
# quadrotor oneshot 0.5364, cem 0.5321 (the only refiner win), trajopt60
# 0.5131 (honest negative).  This study's same-suite rows supersede the
# cross-study comparison.
