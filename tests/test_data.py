"""Task sampler tests (C9): shapes, determinism, multimodality, scenes."""

import jax
import numpy as np
import pytest

from ndivplanning_tpu.data.scenes import (
    random_scene,
    random_scene_batch,
    rasterize_batch,
    rasterize_scene,
)
from ndivplanning_tpu.data.tasks import make_task
from ndivplanning_tpu.utils.config import get_config


@pytest.mark.parametrize("preset,cond_shape", [
    ("pointmass2d", (16, 0)),
    ("goalcond", (16, 4)),
    ("imagecond", (16, 16, 16, 3)),
])
def test_batch_shapes(preset, cond_shape):
    cfg = get_config(preset, batch_size=16, image_size=16)
    task = make_task(cfg)
    batch = task.sample(jax.random.PRNGKey(0), 16)
    assert batch.conditions.shape == cond_shape
    assert batch.real_traj.shape == (16, cfg.horizon, cfg.state_dim)
    assert batch.scenes.goal.shape == (16, 2)


def test_sampling_deterministic_in_key():
    cfg = get_config("goalcond", batch_size=8)
    task = make_task(cfg)
    b1 = task.sample(jax.random.PRNGKey(3), 8)
    b2 = task.sample(jax.random.PRNGKey(3), 8)
    np.testing.assert_array_equal(np.asarray(b1.real_traj),
                                  np.asarray(b2.real_traj))
    b3 = task.sample(jax.random.PRNGKey(4), 8)
    assert not np.array_equal(np.asarray(b1.real_traj),
                              np.asarray(b3.real_traj))


def test_pointmass_multimodal():
    # Endpoints should land near several distinct anchor modes.
    cfg = get_config("pointmass2d", batch_size=256)
    task = make_task(cfg)
    batch = task.sample(jax.random.PRNGKey(1), 256)
    ends = np.asarray(batch.real_traj[:, -1, :])
    # Cluster by angle around the centre: expect >= 6 distinct modes hit.
    ang = np.arctan2(ends[:, 1] - 0.5, ends[:, 0] - 0.5)
    bins = np.unique(np.round(ang / (2 * np.pi / 8)))
    assert len(bins) >= 6


def test_goalcond_conditions_match_trajectory():
    cfg = get_config("goalcond", batch_size=32)
    task = make_task(cfg)
    batch = task.sample(jax.random.PRNGKey(2), 32)
    starts = np.asarray(batch.conditions[:, :2])
    goals = np.asarray(batch.conditions[:, 2:])
    ends = np.asarray(batch.real_traj[:, -1, :])
    # Trajectory terminates near the goal (min-jerk, noise 0.005).
    assert np.median(np.linalg.norm(ends - goals, axis=-1)) < 0.05
    # and first waypoints are nearer the start than the goal.
    first = np.asarray(batch.real_traj[:, 0, :])
    assert np.median(np.linalg.norm(first - starts, axis=-1)) < np.median(
        np.linalg.norm(first - goals, axis=-1))


def test_goalcond_two_sided_detours():
    cfg = get_config("goalcond", batch_size=128)
    task = make_task(cfg)
    batch = task.sample(jax.random.PRNGKey(5), 128)
    traj = np.asarray(batch.real_traj)
    starts = np.asarray(batch.conditions[:, :2])
    goals = np.asarray(batch.conditions[:, 2:])
    mid = traj[:, traj.shape[1] // 2, :]
    chord_mid = (starts + goals) / 2
    d = goals - starts
    perp = np.stack([-d[:, 1], d[:, 0]], -1)
    perp /= np.linalg.norm(perp, axis=-1, keepdims=True)
    side = np.sum((mid - chord_mid) * perp, axis=-1)
    assert (side > 0.02).sum() > 20 and (side < -0.02).sum() > 20


def test_scene_rasterization():
    scene = random_scene(jax.random.PRNGKey(0), n_obstacles=3)
    img = rasterize_scene(scene, size=32)
    assert img.shape == (32, 32, 3)
    occ = np.asarray(img[..., 0])
    assert set(np.unique(occ)).issubset({0.0, 1.0})
    assert occ.sum() > 0  # some obstacle pixels
    # Start/goal blobs peak near the right pixels.
    start = np.asarray(scene.start)
    iy, ix = np.unravel_index(np.argmax(np.asarray(img[..., 1])), (32, 32))
    assert abs((ix + 0.5) / 32 - start[0]) < 0.1
    assert abs((iy + 0.5) / 32 - start[1]) < 0.1


def test_batched_scene_generation():
    scenes = random_scene_batch(jax.random.PRNGKey(1), 8)
    imgs = rasterize_batch(scenes, size=16)
    assert imgs.shape == (8, 16, 16, 3)
    assert scenes.start.shape == (8, 2)
    # Scenes differ from each other.
    assert not np.allclose(np.asarray(scenes.goal[0]),
                           np.asarray(scenes.goal[1]))


def test_imagecond_expert_paths_go_start_to_goal():
    cfg = get_config("imagecond", batch_size=16, image_size=16)
    task = make_task(cfg)
    batch = task.sample(jax.random.PRNGKey(7), 16)
    ends = np.asarray(batch.real_traj[:, -1, :])
    goals = np.asarray(batch.scenes.goal)
    assert np.median(np.linalg.norm(ends - goals, axis=-1)) < 0.05
