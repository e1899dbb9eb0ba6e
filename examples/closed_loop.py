"""Closed-loop (MPC) walkthrough: train briefly, then compare open-loop
execution against receding-horizon replanning on the same scenes.

    python examples/closed_loop.py

Open-loop planning picks ONE trajectory and executes it blind; the MPC
controller (planning/mpc.py) replans from the LIVE environment state
every ``replan_every`` steps, so early tracking error doesn't compound
(measured on trained checkpoints: closed-loop success 1.00 vs 0.95
open-loop, BASELINE.md).  Three surfaces shown:

- ``mpc_rollout``          — one interactive episode (2 dispatches/cycle)
- ``mpc_rollout_batch``    — vmapped episodes, one dispatch total
- ``evaluate_fixed_mpc``   — frozen-suite closed-loop quality (the
                             run-to-run comparable metric; CLI: eval --mpc)

Small sizes so it finishes in ~a minute on CPU.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ndivplanning_tpu.data.scenes import random_scene
from ndivplanning_tpu.planning.mpc import mpc_rollout
from ndivplanning_tpu.planning.server import _condition_for
from ndivplanning_tpu.train.evaluate import evaluate_fixed, evaluate_fixed_mpc
from ndivplanning_tpu.train.loop import train
from ndivplanning_tpu.utils.config import get_config


def main() -> None:
    cfg = get_config("goalcond", batch_size=32, k=4, steps=600,
                     g_hidden=(64, 64), d_hidden=(64,), cond_embed_dim=16,
                     n_candidates=128, log_every=300, eval_every=0,
                     checkpoint_every=0)
    state, _ = train(cfg, workdir="", echo=False)

    # One interactive episode on a random scene.
    scene = random_scene(jax.random.PRNGKey(7))
    result = mpc_rollout(cfg, state, scene, _condition_for(cfg, scene),
                         jax.random.PRNGKey(8), total_steps=32,
                         replan_every=8, n_candidates=64)
    print(f"single episode: reached={int(result.reached)} "
          f"collided={int(result.collided)} replans={result.n_replans} "
          f"path {tuple(result.positions.shape)}")

    # Frozen-suite comparison: open-loop vs closed-loop on the SAME
    # scenes (small suite for the demo; the real protocol uses 512).
    open_loop = evaluate_fixed(cfg, state, n_scenes=32)
    closed = evaluate_fixed_mpc(cfg, state, n_scenes=32, total_steps=32,
                                replan_every=8, n_candidates=64)
    print(f"open-loop suite success:   "
          f"{float(open_loop['eval_success_rate']):.3f}")
    print(f"closed-loop suite success: "
          f"{closed['eval_mpc_success_rate']:.3f} "
          f"(collisions {closed['eval_mpc_collision_rate']:.3f})")


if __name__ == "__main__":
    main()
