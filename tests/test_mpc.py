"""Receding-horizon (MPC) closed-loop planning tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.envs.rollout import (
    ScoreWeights,
    _rollout_scan,
    rollout_waypoints,
)
from ndivplanning_tpu.envs.types import EnvParams, Scene
from ndivplanning_tpu.envs.pointmass import reset
from ndivplanning_tpu.planning.mpc import mpc_rollout
from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.utils.config import get_config


def _cfg():
    return get_config("goalcond", batch_size=4, k=4, g_hidden=(32,),
                      d_hidden=(32,), cond_embed_dim=8)


def test_rollout_from_state_matches_reset_default():
    params = EnvParams.create()
    scene = Scene.create([0.1, 0.1], [0.9, 0.9])
    tau = jnp.linspace(0.1, 0.9, 32)[:, None] * jnp.ones((1, 2))
    a = rollout_waypoints(params, scene, tau)
    b = _rollout_scan(params, scene, tau, "waypoints", ScoreWeights(),
                      state0=reset(params, scene))
    np.testing.assert_allclose(np.asarray(a.positions),
                               np.asarray(b.positions), rtol=1e-6)


def test_mpc_runs_and_replans():
    cfg = _cfg()
    state = create_train_state(cfg)
    scene = Scene.create([0.2, 0.2], [0.8, 0.8])
    condition = jnp.concatenate([scene.start, scene.goal])
    result = mpc_rollout(cfg, state, scene, condition, jax.random.PRNGKey(0),
                         total_steps=16, replan_every=4, n_candidates=16)
    assert result.positions.shape == (16, 2)
    assert result.n_replans == 4
    assert np.all(np.isfinite(np.asarray(result.positions)))
    assert float(result.reached) in (0.0, 1.0)


def test_mpc_respects_bounds():
    cfg = _cfg()
    state = create_train_state(cfg)
    scene = Scene.create([0.1, 0.5], [0.9, 0.5], [[0.5, 0.5, 0.1]])
    condition = jnp.concatenate([scene.start, scene.goal])
    result = mpc_rollout(cfg, state, scene, condition, jax.random.PRNGKey(1),
                         total_steps=12, replan_every=6, n_candidates=8)
    pos = np.asarray(result.positions)
    assert pos.min() >= -1e-6 and pos.max() <= 1.0 + 1e-6


def test_mpc_episode_single_replan_program():
    """ADVICE round-1: all replanning cycles of an episode must share ONE
    compiled replan program (offset is traced, shapes fixed) — a warmed
    second episode compiles nothing at all."""
    import jax

    from ndivplanning_tpu.utils.compile_guard import count_compiles

    cfg = _cfg()
    state = create_train_state(cfg)
    scene = Scene.create([0.2, 0.2], [0.8, 0.8])
    condition = jnp.concatenate([scene.start, scene.goal])
    # Warm episode: compiles _replan once + _execute (+tail) once.
    mpc_rollout(cfg, state, scene, condition, jax.random.PRNGKey(0),
                total_steps=64, replan_every=8, n_candidates=16)
    with count_compiles() as rec:
        mpc_rollout(cfg, state, scene, condition, jax.random.PRNGKey(1),
                    total_steps=64, replan_every=8, n_candidates=16)
    assert rec.count == 0, f"unexpected recompiles: {rec.names}"
