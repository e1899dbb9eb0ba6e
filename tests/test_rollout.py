"""Rollout engine tests: vmapped scoring, modes, weights (SURVEY §3.3)."""

import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.envs import EnvParams, Scene
from ndivplanning_tpu.envs.rollout import (
    ScoreWeights,
    rollout_actions,
    rollout_waypoints,
    score_candidates,
)


def _scene():
    return Scene.create([0.1, 0.1], [0.9, 0.9], [[0.5, 0.5, 0.12]])


def test_score_candidates_matches_individual_rollouts():
    rng = np.random.default_rng(0)
    taus = jnp.asarray(rng.uniform(0, 1, size=(16, 32, 2)).astype(np.float32))
    params = EnvParams.create()
    batch = score_candidates(params, _scene(), taus)
    for i in [0, 5, 15]:
        single = rollout_waypoints(params, _scene(), taus[i])
        np.testing.assert_allclose(float(batch.score[i]), float(single.score),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(batch.positions[i]),
                                   np.asarray(single.positions), rtol=1e-5)


def test_waypoint_tracking_reaches_goal():
    # A straight waypoint line to the goal should get close to it.
    params = EnvParams.create(goal_radius=0.05)
    scene = Scene.create([0.1, 0.1], [0.9, 0.9])
    t = jnp.linspace(0.0, 1.0, 48)[:, None]
    tau = jnp.asarray([0.1, 0.1]) + t * jnp.asarray([0.8, 0.8])
    res = rollout_waypoints(params, scene, tau)
    assert float(res.goal_dist) < 0.1


def test_collision_raises_score():
    params = EnvParams.create()
    scene = _scene()
    t = jnp.linspace(0.0, 1.0, 48)[:, None]
    through = jnp.asarray([0.1, 0.1]) + t * jnp.asarray([0.8, 0.8])  # hits disc
    around_pts = jnp.stack([
        jnp.concatenate([jnp.linspace(0.1, 0.9, 24), jnp.full((24,), 0.9)]),
        jnp.concatenate([jnp.full((24,), 0.1), jnp.linspace(0.1, 0.9, 24)]),
    ], axis=-1)
    r_through = rollout_waypoints(params, scene, through)
    r_around = rollout_waypoints(params, scene, around_pts)
    assert float(r_through.collided) == 1.0
    assert float(r_around.collided) == 0.0
    assert float(r_through.score) > float(r_around.score)


def test_thousand_candidates_one_program():
    # The BASELINE.json:10 workload shape: 1k candidates in one jit.
    rng = np.random.default_rng(1)
    taus = jnp.asarray(rng.uniform(0, 1, size=(1000, 32, 2)).astype(np.float32))
    params = EnvParams.create()
    res = score_candidates(params, _scene(), taus)
    assert res.score.shape == (1000,)
    assert np.all(np.isfinite(np.asarray(res.score)))


def test_actions_mode():
    params = EnvParams.create()
    scene = Scene.create([0.5, 0.5], [0.9, 0.9])
    tau = jnp.zeros((16, 2))
    res = rollout_actions(params, scene, tau)
    np.testing.assert_allclose(np.asarray(res.final_state.pos),
                               np.asarray(scene.start), atol=1e-6)


def test_score_weights_are_applied():
    params = EnvParams.create()
    scene = _scene()
    rng = np.random.default_rng(2)
    tau = jnp.asarray(rng.uniform(0, 1, size=(32, 2)).astype(np.float32))
    r1 = rollout_waypoints(params, scene, tau, weights=ScoreWeights(1.0, 1.0, 0.0))
    r2 = rollout_waypoints(params, scene, tau, weights=ScoreWeights(2.0, 1.0, 0.0))
    expected = float(r1.score) + float(r1.goal_dist)
    np.testing.assert_allclose(float(r2.score), expected, rtol=1e-5)
