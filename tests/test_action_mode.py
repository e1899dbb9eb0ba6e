"""Action-space training path (rollout_mode="actions").

The samplers' experts are waypoint paths; under action mode the task
distills them into the env family's expert ACTION sequences via its own
controller (envs/rollout.py::distill_actions, data/tasks.py::_actionize)
so G trains on dynamically consistent data.  Everything downstream
(rollout scoring, planner, refiners, MPC, eval) already branches on
``cfg.rollout_mode``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.data.tasks import make_task, task_fingerprint
from ndivplanning_tpu.envs.registry import get_env
from ndivplanning_tpu.envs.rollout import distill_actions, rollout
from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.utils.config import get_config


@pytest.mark.parametrize("env", ["pointmass", "unicycle", "quadrotor"])
def test_distilled_actions_reproduce_waypoint_rollout(env):
    # By construction: the distilled actions ARE what the waypoint
    # controller would do, so replaying them in action mode must land on
    # the identical state trajectory (same ops, same latches — bitwise).
    api = get_env(env)
    params = api.make_params()
    scene = Scene.create([0.15, 0.2], [0.85, 0.8], [[0.5, 0.55, 0.1]])
    t = jnp.linspace(0.1, 1.0, 16)[:, None]
    waypoints = (1 - t) * scene.start[None] + t * scene.goal[None]

    via_waypoints = rollout(params, scene, waypoints, mode="waypoints",
                            env=env)
    actions = distill_actions(params, scene, waypoints, env=env)
    assert actions.shape == waypoints.shape
    via_actions = rollout(params, scene, actions, mode="actions", env=env)
    np.testing.assert_array_equal(np.asarray(via_waypoints.positions),
                                  np.asarray(via_actions.positions))
    np.testing.assert_array_equal(float(via_waypoints.goal_dist),
                                  float(via_actions.goal_dist))


def test_action_task_sampler_shapes_and_fingerprint():
    cfg_w = get_config("goalcond", batch_size=8, k=4, env="quadrotor")
    cfg_a = get_config("goalcond", batch_size=8, k=4, env="quadrotor",
                       rollout_mode="actions")
    assert task_fingerprint(cfg_w) != task_fingerprint(cfg_a)
    b_w = make_task(cfg_w).sample(jax.random.PRNGKey(0), 8)
    b_a = make_task(cfg_a).sample(jax.random.PRNGKey(0), 8)
    assert b_a.real_traj.shape == b_w.real_traj.shape
    # Same scenes/conditions (the wrapper only transforms real_traj)...
    np.testing.assert_array_equal(np.asarray(b_a.conditions),
                                  np.asarray(b_w.conditions))
    # ...but real data is now actions, not positions: a quadrotor thrust
    # sequence is nothing like a position path.
    assert float(jnp.max(jnp.abs(b_a.real_traj - b_w.real_traj))) > 0.05
    # Expert actions respect the family's actuation range (env clips to
    # [0, max_thrust] per rotor; the controller emits within range).
    params = get_env("quadrotor").make_params()
    assert float(jnp.min(b_a.real_traj)) >= -1e-6
    assert float(jnp.max(b_a.real_traj)) <= float(params.max_thrust) + 1e-6


def test_action_mode_train_smoke():
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_chunk

    cfg = get_config("goalcond", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, env="quadrotor",
                     rollout_mode="actions", generator_output="linear")
    state = create_train_state(cfg)
    state, metrics = train_chunk(cfg, state, 3)
    for k_, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k_


def test_action_mode_eval_and_planner():
    from ndivplanning_tpu.planning.planner import plan
    from ndivplanning_tpu.train.evaluate import evaluate_fixed
    from ndivplanning_tpu.train.state import create_train_state

    cfg = get_config("goalcond", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, env="quadrotor",
                     rollout_mode="actions", generator_output="linear",
                     n_candidates=32)
    state = create_train_state(cfg)
    out = evaluate_fixed(cfg, state, n_scenes=16)
    assert all(np.isfinite(v) for v in out.values())
    from ndivplanning_tpu.data.scenes import random_scene

    scene = random_scene(jax.random.PRNGKey(3))
    cond = jnp.concatenate([scene.start, scene.goal])
    r = plan(cfg, state, scene, cond, jax.random.PRNGKey(4))
    assert np.isfinite(float(r.best_score))
