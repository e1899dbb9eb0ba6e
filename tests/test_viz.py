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
