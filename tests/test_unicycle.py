"""Unicycle env family: golden twin parity + downstream integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.envs.registry import get_env
from ndivplanning_tpu.envs.rollout import score_candidates
from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.envs.unicycle import (
    UnicycleParams,
    reset,
    step,
    waypoint_control,
)
from tests.python_env_twin import PyUnicycleEnv


def _run_jax(scene, actions, **kw):
    params = UnicycleParams.create(**kw)
    s = reset(params, scene)
    positions = []
    for a in actions:
        s, _ = step(params, scene, s, jnp.asarray(a))
        positions.append(np.asarray(s.pos))
    return np.stack(positions), s


def _run_py(scene_dict, actions, **kw):
    env = PyUnicycleEnv(**kw)
    env.reset(scene_dict)
    return np.stack([env.step(a) for a in actions]), env


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_golden_trajectories_match_python_twin(seed):
    rng = np.random.default_rng(seed)
    actions = rng.normal(scale=3.0, size=(40, 2)).astype(np.float32)
    scene_dict = {
        "start": [0.1, 0.1],
        "goal": [0.9, 0.9],
        "obstacles": [[0.5, 0.5, 0.1], [0.3, 0.7, 0.08]],
    }
    scene = Scene.create(scene_dict["start"], scene_dict["goal"],
                         scene_dict["obstacles"])
    jax_pos, jax_final = _run_jax(scene, actions)
    py_pos, py_env = _run_py(scene_dict, actions)
    np.testing.assert_allclose(jax_pos, py_pos, rtol=1e-5, atol=2e-5)
    assert bool(jax_final.collided > 0.5) == py_env.collided
    assert bool(jax_final.done > 0.5) == py_env.done


def test_reset_faces_goal_at_rest():
    scene = Scene.create([0.2, 0.2], [0.2, 0.8])
    s = reset(UnicycleParams.create(), scene)
    np.testing.assert_allclose(float(s.heading), np.pi / 2, atol=1e-6)
    assert float(s.speed) == 0.0


def test_done_freezes_state():
    params = UnicycleParams.create(goal_radius=10.0)  # instantly done
    scene = Scene.create([0.5, 0.5], [0.6, 0.5])
    s = reset(params, scene)
    s, _ = step(params, scene, s, jnp.asarray([4.0, 0.0]))
    assert float(s.done) == 1.0
    frozen_pos = np.asarray(s.pos)
    s2, _ = step(params, scene, s, jnp.asarray([4.0, 2.0]))
    np.testing.assert_array_equal(np.asarray(s2.pos), frozen_pos)
    assert int(s2.t) == int(s.t)


def test_speed_never_negative_and_capped():
    params = UnicycleParams.create(max_speed=1.0)
    scene = Scene.create([0.5, 0.5], [0.9, 0.9])
    s = reset(params, scene)
    for a in ([-10.0, 0.0], [-10.0, 0.0]):
        s, _ = step(params, scene, s, jnp.asarray(a))
        assert float(s.speed) >= 0.0
    for _ in range(20):
        s, _ = step(params, scene, s, jnp.asarray([10.0, 0.0]))
        assert float(s.speed) <= 1.0 + 1e-6


def test_waypoint_controller_reaches_goal():
    """A straight waypoint ramp to the goal should be trackable."""
    params = UnicycleParams.create()
    scene = Scene.create([0.1, 0.1], [0.9, 0.9])
    s = reset(params, scene)
    waypoints = jnp.linspace(jnp.asarray([0.1, 0.1]),
                             jnp.asarray([0.9, 0.9]), 32)
    for t in range(40):  # track the final waypoint a few extra steps
        a = waypoint_control(params, s, waypoints[min(t, 31)])
        s, _ = step(params, scene, s, a)
    assert float(s.done) == 1.0, np.asarray(s.pos)


def test_score_candidates_unicycle():
    scene = Scene.create([0.1, 0.1], [0.9, 0.9], [[0.5, 0.5, 0.1]])
    key = jax.random.PRNGKey(0)
    taus = jax.random.uniform(key, (32, 32, 2))
    params = UnicycleParams.create()
    res = score_candidates(params, scene, taus, env="unicycle")
    assert res.score.shape == (32,)
    assert np.isfinite(np.asarray(res.score)).all()


def test_planner_and_eval_over_unicycle():
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.planning.planner import plan
    from ndivplanning_tpu.train.evaluate import evaluate
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config("goalcond", env="unicycle", batch_size=8, k=4,
                     g_hidden=(32,), d_hidden=(32,), cond_embed_dim=8)
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(1))
    condition = jnp.concatenate([scene.start, scene.goal])
    result = plan(cfg, state, scene, condition, jax.random.PRNGKey(2),
                  n_candidates=32, n_diverse=4)
    assert np.isfinite(float(result.best_score))
    out = evaluate(cfg, state, jax.random.PRNGKey(3), eval_batch=8)
    assert 0.0 <= float(out["eval_success_rate"]) <= 1.0


def test_mpc_and_cem_over_unicycle():
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.planning.cem import plan_cem
    from ndivplanning_tpu.planning.mpc import mpc_rollout
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config("goalcond", env="unicycle", batch_size=8, k=4,
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


def test_registry_rejects_unknown():
    with pytest.raises(ValueError):
        get_env("hovercraft")
