"""Quadrotor env family: golden twin parity + downstream integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.envs.quadrotor import (
    QuadrotorParams,
    reset,
    step,
    waypoint_control,
)
from ndivplanning_tpu.envs.rollout import score_candidates
from ndivplanning_tpu.envs.types import Scene
from tests.python_env_twin import PyQuadrotorEnv


def _run_jax(scene, actions, **kw):
    params = QuadrotorParams.create(**kw)
    s = reset(params, scene)
    positions = []
    for a in actions:
        s, _ = step(params, scene, s, jnp.asarray(a))
        positions.append(np.asarray(s.pos))
    return np.stack(positions), s


def _run_py(scene_dict, actions, **kw):
    env = PyQuadrotorEnv(**kw)
    env.reset(scene_dict)
    return np.stack([env.step(a) for a in actions]), env


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_golden_trajectories_match_python_twin(seed):
    rng = np.random.default_rng(seed)
    # Thrusts around hover so trajectories stay interesting (pure noise
    # in [0, max] would mostly pin the quad to the ceiling or floor).
    actions = (0.25 + rng.normal(scale=0.5, size=(40, 2))).astype(
        np.float32)
    scene_dict = {
        "start": [0.3, 0.6],
        "goal": [0.9, 0.9],
        "obstacles": [[0.5, 0.5, 0.1], [0.3, 0.2, 0.08]],
    }
    scene = Scene.create(scene_dict["start"], scene_dict["goal"],
                         scene_dict["obstacles"])
    jax_pos, jax_final = _run_jax(scene, actions)
    py_pos, py_env = _run_py(scene_dict, actions)
    np.testing.assert_allclose(jax_pos, py_pos, rtol=1e-5, atol=2e-5)
    assert bool(jax_final.collided > 0.5) == py_env.collided
    assert bool(jax_final.done > 0.5) == py_env.done


def test_reset_level_at_rest():
    scene = Scene.create([0.2, 0.2], [0.8, 0.8])
    s = reset(QuadrotorParams.create(), scene)
    assert float(s.theta) == 0.0 and float(s.omega) == 0.0
    np.testing.assert_array_equal(np.asarray(s.vel), np.zeros(2))


def test_gravity_pulls_and_hover_holds():
    """Zero thrust falls; exact hover thrust (m·g split over two level
    rotors) holds altitude — the underactuation signature."""
    params = QuadrotorParams.create()
    scene = Scene.create([0.5, 0.5], [0.9, 0.9])
    s = reset(params, scene)
    for _ in range(5):
        s, _ = step(params, scene, s, jnp.asarray([0.0, 0.0]))
    assert float(s.pos[1]) < 0.5  # fell
    s = reset(params, scene)
    hover = float(params.mass * params.gravity) / 2.0
    for _ in range(10):
        s, _ = step(params, scene, s, jnp.asarray([hover, hover]))
    np.testing.assert_allclose(np.asarray(s.pos), [0.5, 0.5], atol=1e-5)


def test_done_freezes_state():
    params = QuadrotorParams.create(goal_radius=10.0)  # instantly done
    scene = Scene.create([0.5, 0.5], [0.6, 0.5])
    s = reset(params, scene)
    s, _ = step(params, scene, s, jnp.asarray([1.0, 1.0]))
    assert float(s.done) == 1.0
    frozen_pos = np.asarray(s.pos)
    s2, _ = step(params, scene, s, jnp.asarray([1.5, 0.0]))
    np.testing.assert_array_equal(np.asarray(s2.pos), frozen_pos)
    assert float(s2.theta) == float(s.theta)
    assert int(s2.t) == int(s.t)


def test_thrust_clips_and_omega_caps():
    params = QuadrotorParams.create(max_omega=2.0)
    scene = Scene.create([0.5, 0.5], [0.9, 0.9])
    s = reset(params, scene)
    for _ in range(20):
        s, _ = step(params, scene, s, jnp.asarray([-5.0, 50.0]))
        assert abs(float(s.omega)) <= 2.0 + 1e-6
    # negative commands clip to 0 (rotors cannot pull): with u1<-0,
    # u2 huge, the quad spins and thrusts but never exceeds per-rotor cap
    assert np.isfinite(np.asarray(s.pos)).all()


def test_waypoint_controller_reaches_goal():
    """A straight waypoint ramp must be trackable by the cascaded
    controller across different goal directions (incl. against
    gravity)."""
    params = QuadrotorParams.create()
    for start, goal in [([0.1, 0.1], [0.9, 0.9]),
                        ([0.9, 0.9], [0.1, 0.2]),
                        ([0.5, 0.1], [0.5, 0.9])]:
        scene = Scene.create(start, goal)
        s = reset(params, scene)
        waypoints = jnp.linspace(jnp.asarray(start, jnp.float32),
                                 jnp.asarray(goal, jnp.float32), 32)
        for t in range(40):  # track the final waypoint a few extra steps
            a = waypoint_control(params, s, waypoints[min(t, 31)])
            s, _ = step(params, scene, s, a)
        assert float(s.done) == 1.0, (start, goal, np.asarray(s.pos))


def test_score_candidates_quadrotor():
    scene = Scene.create([0.1, 0.1], [0.9, 0.9], [[0.5, 0.5, 0.1]])
    key = jax.random.PRNGKey(0)
    taus = jax.random.uniform(key, (32, 32, 2))
    params = QuadrotorParams.create()
    res = score_candidates(params, scene, taus, env="quadrotor")
    assert res.score.shape == (32,)
    assert np.isfinite(np.asarray(res.score)).all()


def test_planner_and_eval_over_quadrotor():
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.planning.planner import plan
    from ndivplanning_tpu.train.evaluate import evaluate
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config("goalcond", env="quadrotor", batch_size=8, k=4,
                     g_hidden=(32,), d_hidden=(32,), cond_embed_dim=8)
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(1))
    condition = jnp.concatenate([scene.start, scene.goal])
    result = plan(cfg, state, scene, condition, jax.random.PRNGKey(2),
                  n_candidates=32, n_diverse=4)
    assert np.isfinite(float(result.best_score))
    out = evaluate(cfg, state, jax.random.PRNGKey(3), eval_batch=8)
    assert 0.0 <= float(out["eval_success_rate"]) <= 1.0


def test_mpc_and_cem_over_quadrotor():
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.planning.cem import plan_cem
    from ndivplanning_tpu.planning.mpc import mpc_rollout
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config("goalcond", env="quadrotor", batch_size=8, k=4,
                     g_hidden=(32,), d_hidden=(32,), cond_embed_dim=8)
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(5))
    condition = jnp.concatenate([scene.start, scene.goal])
    r = mpc_rollout(cfg, state, scene, condition, jax.random.PRNGKey(6),
                    total_steps=16, replan_every=8, n_candidates=16)
    assert r.positions.shape == (16, 2)
    res, curve = plan_cem(cfg, state, scene, condition,
                          jax.random.PRNGKey(7), n_candidates=16, n_iters=2)
    assert np.isfinite(float(res.best_score))
