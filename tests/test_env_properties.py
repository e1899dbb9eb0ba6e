"""Env invariant sweep: random action sequences never violate physics
bounds (SURVEY.md §4 unit/env; complements the golden-trajectory tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.envs import EnvParams, Scene, reset, step
from ndivplanning_tpu.envs.rollout import rollout_actions


def test_random_rollouts_respect_invariants():
    params = EnvParams.create()
    scene = Scene.create([0.3, 0.3], [0.9, 0.9], [[0.6, 0.6, 0.1]])
    rng = np.random.default_rng(0)
    for trial in range(5):
        actions = jnp.asarray(
            rng.normal(scale=10.0, size=(64, 2)).astype(np.float32))
        res = rollout_actions(params, scene, actions)
        pos = np.asarray(res.positions)
        # Bounds always respected.
        assert pos.min() >= 0.0 - 1e-6 and pos.max() <= 1.0 + 1e-6
        # Per-step displacement bounded by max_speed * dt.
        deltas = np.linalg.norm(np.diff(pos, axis=0), axis=-1)
        assert deltas.max() <= float(params.max_speed * params.dt) + 1e-5
        # Latches are monotone by construction; flags are 0/1.
        assert float(res.collided) in (0.0, 1.0)
        assert float(res.reached) in (0.0, 1.0)


def test_step_count_stops_at_done():
    params = EnvParams.create(goal_radius=0.3)
    scene = Scene.create([0.5, 0.5], [0.6, 0.5])
    s = reset(params, scene)
    for _ in range(10):
        s, _ = step(params, scene, s, jnp.asarray([1.0, 0.0]))
    assert int(s.t) <= 10
    assert float(s.done) == 1.0
    t_done = int(s.t)
    for _ in range(5):
        s, _ = step(params, scene, s, jnp.asarray([1.0, 0.0]))
    assert int(s.t) == t_done  # frozen


def test_vmap_over_scenes_and_candidates():
    # Batched scenes x batched candidates in one program.
    params = EnvParams.create()
    scenes = jax.vmap(
        lambda i: Scene.create(jnp.asarray([0.1, 0.1]) + 0.01 * i,
                               jnp.asarray([0.9, 0.9]))
    )(jnp.arange(3, dtype=jnp.float32))
    taus = jnp.asarray(
        np.random.default_rng(1).normal(size=(3, 5, 16, 2)).astype(np.float32))

    def per_scene(scene, t_batch):
        return jax.vmap(lambda t: rollout_actions(params, scene, t))(t_batch)

    res = jax.vmap(per_scene)(scenes, taus)
    assert res.score.shape == (3, 5)
    assert np.all(np.isfinite(np.asarray(res.score)))
