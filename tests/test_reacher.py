"""Reacher (two-link arm) env family: golden twin parity, IK round-trip,
link-collision semantics, and downstream integration (SURVEY.md §2 C6 —
third family behind the env registry)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.envs.registry import get_env
from ndivplanning_tpu.envs.reacher import (
    ReacherParams,
    forward_kinematics,
    inverse_kinematics,
    reset,
    step,
    waypoint_control,
)
from ndivplanning_tpu.envs.rollout import score_candidates
from ndivplanning_tpu.envs.types import Scene
from tests.python_env_twin import PyReacherEnv


def _run_jax(scene, actions, **kw):
    params = ReacherParams.create(**kw)
    s = reset(params, scene)
    positions = []
    for a in actions:
        s, _ = step(params, scene, s, jnp.asarray(a))
        positions.append(np.asarray(s.pos))
    return np.stack(positions), s


def _run_py(scene_dict, actions, **kw):
    env = PyReacherEnv(**kw)
    env.reset(scene_dict)
    return np.stack([env.step(a) for a in actions]), env


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_golden_trajectories_match_python_twin(seed):
    rng = np.random.default_rng(seed)
    actions = rng.normal(scale=20.0, size=(40, 2)).astype(np.float32)
    scene_dict = {
        "start": [0.2, 0.3],
        "goal": [0.85, 0.8],
        "obstacles": [[0.5, 0.75, 0.1], [0.3, 0.6, 0.08]],
    }
    scene = Scene.create(scene_dict["start"], scene_dict["goal"],
                         scene_dict["obstacles"])
    jax_pos, jax_final = _run_jax(scene, actions)
    py_pos, py_env = _run_py(scene_dict, actions)
    # FK chains two f32 sin/cos through unwrapped angles: slightly looser
    # atol than the particle envs, same contract.
    np.testing.assert_allclose(jax_pos, py_pos, rtol=1e-5, atol=5e-5)
    assert bool(jax_final.collided > 0.5) == py_env.collided
    assert bool(jax_final.done > 0.5) == py_env.done


def test_ik_fk_roundtrip_covers_unit_box():
    """IK is exact (≤1 ulp-ish) everywhere the samplers can put a start."""
    params = ReacherParams.create()
    rng = np.random.default_rng(0)
    targets = rng.uniform(0.02, 0.98, size=(128, 2)).astype(np.float32)
    q = jax.vmap(lambda t: inverse_kinematics(params, t))(jnp.asarray(targets))
    ee = jax.vmap(lambda qq: forward_kinematics(params, qq)[1])(q)
    np.testing.assert_allclose(np.asarray(ee), targets, atol=2e-6)


def test_reset_places_tip_at_start_at_rest():
    scene = Scene.create([0.15, 0.85], [0.9, 0.1])
    s = reset(ReacherParams.create(), scene)
    np.testing.assert_allclose(np.asarray(s.pos), [0.15, 0.85], atol=2e-6)
    np.testing.assert_array_equal(np.asarray(s.qd), np.zeros(2, np.float32))
    assert float(s.done) == 0.0


def test_done_freezes_state():
    params = ReacherParams.create(goal_radius=10.0)  # instantly done
    scene = Scene.create([0.5, 0.7], [0.6, 0.5])
    s = reset(params, scene)
    s, _ = step(params, scene, s, jnp.asarray([5.0, -3.0]))
    assert float(s.done) == 1.0
    frozen = np.asarray(s.pos)
    s2, _ = step(params, scene, s, jnp.asarray([40.0, 40.0]))
    np.testing.assert_array_equal(np.asarray(s2.pos), frozen)
    np.testing.assert_array_equal(np.asarray(s2.q), np.asarray(s.q))
    assert int(s2.t) == int(s.t)


def test_joint_speed_capped():
    params = ReacherParams.create(max_qd=2.0)
    scene = Scene.create([0.3, 0.5], [0.9, 0.9])
    s = reset(params, scene)
    for _ in range(20):
        s, _ = step(params, scene, s, jnp.asarray([40.0, -40.0]))
        assert float(jnp.max(jnp.abs(s.qd))) <= 2.0 + 1e-6


def test_link_collision_without_tip_contact():
    """An obstacle sitting ON the first link (far from the tip) must latch
    collided — the arm's body sweeps obstacles its end-effector never
    touches, the semantics the particle envs cannot express."""
    params = ReacherParams.create()
    scene_free = Scene.create([0.9, 0.5], [0.1, 0.5])
    s = reset(params, scene_free)
    elbow, _ = forward_kinematics(params, s.q)
    mid = (np.asarray(params.base) + np.asarray(elbow)) / 2.0
    scene = Scene.create([0.9, 0.5], [0.1, 0.5],
                         [[float(mid[0]), float(mid[1]), 0.05]])
    # tip starts well clear of the obstacle disc
    assert float(jnp.linalg.norm(s.pos - jnp.asarray(mid))) > 0.2
    s2, info = step(params, scene, reset(params, scene), jnp.zeros(2))
    assert float(s2.collided) == 1.0
    assert float(info.collided_now) == 1.0


def test_waypoint_controller_reaches_goal():
    """A straight waypoint ramp to the goal should be trackable (DLS
    velocity-resolved controller; plain J^T PD measurably was not)."""
    params = ReacherParams.create()
    for seed in range(5):
        rng = np.random.default_rng(seed)
        start = rng.uniform(0.1, 0.9, 2).astype(np.float32)
        goal = rng.uniform(0.1, 0.9, 2).astype(np.float32)
        scene = Scene.create(start.tolist(), goal.tolist())
        s = reset(params, scene)
        wps = jnp.linspace(jnp.asarray(start), jnp.asarray(goal), 32)
        for t in range(48):  # track the final waypoint a few extra steps
            a = waypoint_control(params, s, wps[min(t, 31)])
            s, _ = step(params, scene, s, a)
        assert float(s.done) == 1.0, (seed, np.asarray(s.pos), goal)


def test_score_candidates_reacher():
    scene = Scene.create([0.2, 0.2], [0.8, 0.8], [[0.5, 0.35, 0.08]])
    key = jax.random.PRNGKey(0)
    taus = jax.random.uniform(key, (32, 32, 2))
    params = ReacherParams.create()
    res = score_candidates(params, scene, taus, env="reacher")
    assert res.score.shape == (32,)
    assert np.isfinite(np.asarray(res.score)).all()


def test_planner_and_eval_over_reacher():
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.planning.planner import plan
    from ndivplanning_tpu.train.evaluate import evaluate
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config("goalcond", env="reacher", batch_size=8, k=4,
                     g_hidden=(32,), d_hidden=(32,), cond_embed_dim=8)
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(1))
    condition = jnp.concatenate([scene.start, scene.goal])
    result = plan(cfg, state, scene, condition, jax.random.PRNGKey(2),
                  n_candidates=32, n_diverse=4)
    assert np.isfinite(float(result.best_score))
    out = evaluate(cfg, state, jax.random.PRNGKey(3), eval_batch=8)
    assert 0.0 <= float(out["eval_success_rate"]) <= 1.0


def test_mpc_and_cem_over_reacher():
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.planning.cem import plan_cem
    from ndivplanning_tpu.planning.mpc import mpc_rollout
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config("goalcond", env="reacher", batch_size=8, k=4,
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


def test_registry_exposes_reacher():
    api = get_env("reacher")
    scene = Scene.create([0.3, 0.3], [0.7, 0.7])
    s = api.reset(api.make_params(), scene)
    s2, _ = api.step(api.make_params(), scene, s, jnp.zeros(2))
    assert int(s2.t) == 1
