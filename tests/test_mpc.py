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


def test_mpc_fused_matches_shape_and_semantics():
    """The single-program episode (mpc_rollout_fused) returns the same
    result structure as the 2-dispatch-per-cycle loop, and its executed
    path stays inside the arena."""
    from ndivplanning_tpu.planning.mpc import mpc_rollout_fused

    cfg = _cfg()
    state = create_train_state(cfg)
    scene = Scene.create([0.2, 0.2], [0.8, 0.8])
    condition = jnp.concatenate([scene.start, scene.goal])
    result = mpc_rollout_fused(cfg, state, scene, condition,
                               jax.random.PRNGKey(0), total_steps=16,
                               replan_every=4, n_candidates=16)
    assert result.positions.shape == (16, 2)
    assert result.n_replans == 4
    pos = np.asarray(result.positions)
    assert np.all(np.isfinite(pos))
    assert pos.min() >= -1e-6 and pos.max() <= 1.0 + 1e-6
    assert float(result.reached) in (0.0, 1.0)


def test_mpc_fused_rejects_nondivisible_steps():
    import pytest

    from ndivplanning_tpu.planning.mpc import mpc_rollout_fused

    cfg = _cfg()
    state = create_train_state(cfg)
    scene = Scene.create([0.2, 0.2], [0.8, 0.8])
    condition = jnp.concatenate([scene.start, scene.goal])
    with pytest.raises(ValueError, match="total_steps"):
        mpc_rollout_fused(cfg, state, scene, condition,
                          jax.random.PRNGKey(0), total_steps=10,
                          replan_every=4, n_candidates=8)


def test_mpc_batch_vmaps_episodes():
    """mpc_rollout_batch == per-scene mpc_rollout_fused (same keys), with
    a leading batch axis — the suite-scale closed-loop eval contract."""
    from ndivplanning_tpu.data.scenes import random_scene_batch
    from ndivplanning_tpu.planning.mpc import (
        mpc_rollout_batch,
        mpc_rollout_fused,
    )

    cfg = _cfg()
    state = create_train_state(cfg)
    scenes = random_scene_batch(jax.random.PRNGKey(3), 3)
    conds = jax.vmap(
        lambda s: jnp.concatenate([s.start, s.goal]))(scenes)
    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    batch = mpc_rollout_batch(cfg, state, scenes, conds, keys,
                              total_steps=16, replan_every=4,
                              n_candidates=16)
    assert batch.positions.shape == (3, 16, 2)
    assert batch.reached.shape == (3,)
    one = mpc_rollout_fused(
        cfg, state, jax.tree.map(lambda a: a[1], scenes), conds[1],
        keys[1], total_steps=16, replan_every=4, n_candidates=16)
    np.testing.assert_allclose(np.asarray(batch.positions[1]),
                               np.asarray(one.positions),
                               rtol=1e-5, atol=1e-6)


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
