"""Deployment walkthrough: train -> export -> consume standalone.

    python examples/deploy_bundle.py [out_dir]

Trains a small goal-conditioned NDiv-GAN for a few hundred steps,
exports the StableHLO deployment bundle (utils/export.py), then plans a
scene batch through the reloaded ``planner.stablehlo`` artifact the way
a serving deployment would — with nothing but ``jax.export`` (no model
code, no flax, no checkpoint plumbing touched on the consumption side).

The planner artifact is the WHOLE pipeline (candidate generation,
vmapped env rollouts, scoring, diverse top-m selection) in one program;
the batch dimension is symbolic, so the same file serves any request
batch size.  See docs/deployment.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ndiv_bundle_demo"

    # ---- producer side: train briefly and export -------------------
    from ndivplanning_tpu.train.loop import train
    from ndivplanning_tpu.utils.config import get_config
    from ndivplanning_tpu.utils.export import export_bundle

    cfg = get_config("goalcond", batch_size=32, k=4, steps=400,
                     g_hidden=(64, 64), d_hidden=(64,), cond_embed_dim=16,
                     n_candidates=128, log_every=200, eval_every=0,
                     checkpoint_every=0)
    state, _ = train(cfg, workdir="", echo=False)
    manifest = export_bundle(cfg, state, out)
    print(f"exported bundle to {out}:",
          json.dumps({k: manifest[k]["bytes"] for k in
                      ("generator", "planner")}))

    # ---- consumer side: jax.export only ----------------------------
    from jax import export as jexport

    call = jexport.deserialize(
        open(os.path.join(out, "planner.stablehlo"), "rb").read()).call

    b = 3  # symbolic batch: any request size works without re-export
    start = np.tile([0.1, 0.1], (b, 1)).astype(np.float32)
    goal = np.tile([0.9, 0.9], (b, 1)).astype(np.float32)
    conditions = np.concatenate([start, goal], axis=1)
    obstacles = np.zeros((b, 8, 3), np.float32)
    obstacles[:, 0] = [0.5, 0.5, 0.1]
    mask = np.zeros((b, 8), np.float32)
    mask[:, 0] = 1.0
    seeds = np.arange(b, dtype=np.int32)

    best_traj, best_score, best_reached, diverse = call(
        conditions, start, goal, obstacles, mask, seeds)
    best_traj = np.asarray(best_traj)
    print(f"planned batch of {b}: best_traj {best_traj.shape}, "
          f"scores {np.round(np.asarray(best_score), 3).tolist()}, "
          f"reached {np.asarray(best_reached).tolist()}")
    assert best_traj.shape[0] == b

    # ---- CEM refinement artifact: the measured-best planning mode ---
    cem = jexport.deserialize(
        open(os.path.join(out, "cem_planner.stablehlo"), "rb").read()).call
    c_traj, c_score, c_reached, c_diverse, curve = cem(
        conditions, start, goal, obstacles, mask, seeds)
    curve = np.asarray(curve)
    print(f"CEM-refined: scores {np.round(np.asarray(c_score), 3).tolist()}"
          f", refinement curves (monotone) "
          f"{np.round(curve, 3).tolist()}")
    assert np.all(curve[:, 1:] <= curve[:, :-1] + 1e-6)

    # ---- closed-loop MPC artifact: replan-execute episodes ----------
    mpc = jexport.deserialize(
        open(os.path.join(out, "mpc_controller.stablehlo"),
             "rb").read()).call
    positions, reached, collided = mpc(
        conditions, start, goal, obstacles, mask, seeds)
    positions = np.asarray(positions)
    print(f"MPC closed loop: paths {positions.shape}, reached "
          f"{np.asarray(reached).tolist()}, collided "
          f"{np.asarray(collided).tolist()}")
    assert positions.shape[0] == b


if __name__ == "__main__":
    main()
