"""Visualisation smoke tests (Agg backend, no display)."""

import numpy as np
import pytest

pytest.importorskip("matplotlib")

from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.utils.viz import plot_loss_curves, plot_trajectories


def test_plot_trajectories_saves_png(tmp_path):
    scene = Scene.create([0.1, 0.1], [0.9, 0.9], [[0.5, 0.5, 0.1]])
    taus = np.random.default_rng(0).uniform(0, 1, size=(8, 32, 2))
    scores = np.random.default_rng(1).uniform(size=(8,))
    out = tmp_path / "traj.png"
    plot_trajectories(scene, taus, scores, path=str(out), title="test")
    assert out.exists() and out.stat().st_size > 1000


def test_plot_loss_curves(tmp_path):
    history = [{"step": s, "d_loss": 1.0 / (s + 1), "g_adv": 0.5,
                "g_ndiv": 0.1} for s in range(10)]
    out = tmp_path / "loss.png"
    plot_loss_curves(history, path=str(out))
    assert out.exists()


def test_plot_mpc_episode_saves_png(tmp_path):
    from ndivplanning_tpu.utils.viz import plot_mpc_episode

    scene = Scene.create([0.1, 0.1], [0.9, 0.9], [[0.5, 0.5, 0.1]])
    positions = np.linspace([0.1, 0.1], [0.9, 0.9], 64)
    out = tmp_path / "episode.png"
    plot_mpc_episode(scene, positions, reached=1.0, collided=0.0,
                     replan_every=8, path=str(out), title="test")
    assert out.exists() and out.stat().st_size > 1000


def test_plot_run_curves(tmp_path):
    from ndivplanning_tpu.utils.viz import plot_run_curves

    rows = [{"step": s, "d_loss": 1.0, "g_adv": 0.5, "g_ndiv": 0.1,
             "g_total": 0.6} for s in range(0, 500, 50)]
    rows += [{"step": s, "kind": "eval", "eval_success_rate": 0.5,
              "eval_collision_rate": 0.1, "eval_mean_pairwise_dist": 0.6,
              "raw_eval_success_rate": 0.4} for s in (200, 400)]
    out = tmp_path / "curves.png"
    _, n_train, n_eval = plot_run_curves(rows, path=str(out), title="run")
    assert out.exists() and out.stat().st_size > 1000
    assert n_train == 10 and n_eval == 2
