"""Native host-data library: C++ vs JAX/NumPy parity (native/ndiv_host.cc)."""

import jax
import numpy as np

from ndivplanning_tpu.data.native import (
    collision_mask_host,
    native_available,
    rasterize_scenes_host,
)
from ndivplanning_tpu.data.scenes import random_scene_batch, rasterize_batch


def _scenes(n=6):
    scenes = random_scene_batch(jax.random.PRNGKey(0), n)
    return (np.asarray(scenes.obstacles), np.asarray(scenes.obstacle_mask),
            np.asarray(scenes.start), np.asarray(scenes.goal), scenes)


def test_native_builds():
    assert native_available(), "g++ build of native/ndiv_host.cc failed"


def test_rasterize_matches_jax():
    obstacles, mask, starts, goals, scenes = _scenes()
    got = rasterize_scenes_host(obstacles, mask, starts, goals, size=32)
    want = np.asarray(rasterize_batch(scenes, size=32))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rasterize_numpy_fallback_matches_native():
    from ndivplanning_tpu.data import native as native_mod

    obstacles, mask, starts, goals, _ = _scenes(4)
    fast = rasterize_scenes_host(obstacles, mask, starts, goals, size=16)
    lib, native_mod._lib, native_mod._lib_failed = native_mod._lib, None, True
    try:
        slow = rasterize_scenes_host(obstacles, mask, starts, goals, size=16)
    finally:
        native_mod._lib, native_mod._lib_failed = lib, False
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)


def test_collision_mask():
    obstacles = np.zeros((2, 8, 3), np.float32)
    obstacles[0, 0] = [0.5, 0.5, 0.1]
    obstacles[1, 0] = [0.5, 0.5, 0.1]
    mask = np.zeros((2, 8), np.float32)
    mask[:, 0] = 1.0
    trajs = np.zeros((2, 4, 2), np.float32)
    trajs[0] = [[0.1, 0.1], [0.3, 0.3], [0.5, 0.5], [0.9, 0.9]]  # hits
    trajs[1] = [[0.1, 0.1], [0.1, 0.9], [0.9, 0.9], [0.9, 0.1]]  # misses
    got = collision_mask_host(trajs, obstacles, mask)
    np.testing.assert_array_equal(got, [1, 0])


def test_collision_mask_matches_fallback():
    from ndivplanning_tpu.data import native as native_mod

    rng = np.random.default_rng(3)
    obstacles, mask, _, _, _ = _scenes(8)
    trajs = rng.uniform(0, 1, size=(8, 32, 2)).astype(np.float32)
    fast = collision_mask_host(trajs, obstacles, mask)
    lib, native_mod._lib, native_mod._lib_failed = native_mod._lib, None, True
    try:
        slow = collision_mask_host(trajs, obstacles, mask)
    finally:
        native_mod._lib, native_mod._lib_failed = lib, False
    np.testing.assert_array_equal(fast, slow)


def test_multithreaded_matches_single():
    obstacles, mask, starts, goals, _ = _scenes(16)
    a = rasterize_scenes_host(obstacles, mask, starts, goals, size=24,
                              n_threads=1)
    b = rasterize_scenes_host(obstacles, mask, starts, goals, size=24,
                              n_threads=8)
    np.testing.assert_array_equal(a, b)
