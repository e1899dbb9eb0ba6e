"""Quickstart: train a goal-conditioned NDiv-GAN, then plan and render.

    python examples/quickstart.py [workdir]

Uses small steps/widths so it finishes in ~a minute on CPU; drop the
overrides for the full preset.  Produces <workdir>/plan.png showing the
diverse top-8 candidate trajectories through a random scene.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ndivplanning_tpu.data.scenes import random_scene
from ndivplanning_tpu.planning.planner import plan
from ndivplanning_tpu.planning.server import _condition_for
from ndivplanning_tpu.train.loop import train
from ndivplanning_tpu.utils.config import get_config
from ndivplanning_tpu.utils.viz import plot_loss_curves, plot_trajectories


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ndiv_quickstart"
    cfg = get_config(
        "goalcond",
        workdir=workdir,
        steps=600,
        batch_size=64,
        g_hidden=(128, 128),
        d_hidden=(128, 128),
        eval_every=300,
        log_every=100,
    )

    # 1. Train (restores + resumes automatically if workdir has a checkpoint;
    #    an already-finished run yields no new history rows).
    state, history = train(cfg)
    if history:
        plot_loss_curves(history, path=os.path.join(workdir, "losses.png"))

    # 2. Plan: 1000 candidate trajectories through a random scene,
    #    scored sim-in-the-loop, best + diverse top-8 selected.
    scene = random_scene(jax.random.PRNGKey(7))
    condition = _condition_for(cfg, scene)
    result = plan(cfg, state, scene, condition, jax.random.PRNGKey(8),
                  n_diverse=8)
    print(f"best candidate score: {float(result.best_score):.3f} "
          f"(reached goal: {bool(result.best_reached)})")

    # 3. Render the diverse set.
    out = os.path.join(workdir, "plan.png")
    plot_trajectories(scene, result.taus[result.diverse_idx],
                      result.scores[result.diverse_idx], path=out,
                      title="diverse top-8 planned trajectories",
                      highlight=result.best_traj)
    print(f"wrote {out} and {workdir}/losses.png")


if __name__ == "__main__":
    main()
