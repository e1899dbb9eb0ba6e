"""Direct trajectory-optimisation planner tests (planning/trajopt.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.data.scenes import random_scene, rasterize_scene
from ndivplanning_tpu.planning.trajopt import plan_trajopt, plan_trajopt_batch
from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.utils.config import get_config


def _cfg(**kw):
    d = dict(batch_size=8, k=4, g_hidden=(32,), d_hidden=(32,),
             cond_embed_dim=8, image_size=16, n_candidates=64)
    d.update(kw)
    return get_config("planning", **d)


def _setup(seed=1, **kw):
    cfg = _cfg(**kw)
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(seed))
    condition = rasterize_scene(scene, size=cfg.image_size)
    return cfg, state, scene, condition


def test_trajopt_descends_and_never_loses_to_prior():
    cfg, state, scene, condition = _setup()
    result, curve = plan_trajopt(cfg, state, scene, condition,
                                 jax.random.PRNGKey(2), n_candidates=16,
                                 n_steps=10)
    curve = np.asarray(curve)
    assert np.isfinite(curve).all()
    # Adam directly on tau should make net progress on the soft cost.
    assert curve[-1] < curve[0]
    # Union selection: best over warm-start+optimised <= warm-start best.
    n = 16
    prior_best = float(jnp.min(result.scores[:n]))
    assert float(result.best_score) <= prior_best + 1e-6
    assert result.taus.shape == (2 * n, cfg.horizon, cfg.state_dim)


def test_trajopt_escapes_generator_manifold():
    # An UNTRAINED G draws trajectories clustered near the scene centre,
    # nowhere near the goal; direct tau optimisation must still reach it
    # (that is the point of the planner — the latent refiners are capped
    # by what G can express).  The scene keeps its obstacle OFF the
    # start-goal line: first-order trajopt slides paths around obstacles
    # but cannot jump penetration barriers (it is local — basin coverage
    # comes from the diverse warm starts, see the module docstring), so
    # a wall-through-the-middle scene would test the warm starts, not
    # the optimiser.
    from ndivplanning_tpu.envs.types import Scene

    cfg, state, _, _ = _setup()
    scene = Scene.create([0.1, 0.1], [0.9, 0.9], [[0.25, 0.75, 0.08]])
    condition = rasterize_scene(scene, size=cfg.image_size)
    result, _ = plan_trajopt(cfg, state, scene, condition,
                             jax.random.PRNGKey(3), n_candidates=16,
                             n_steps=80, lr=0.05)
    n = 16
    prior_best = float(jnp.min(result.scores[:n]))
    assert float(result.best_score) < prior_best - 0.05, (
        "trajopt should beat the raw G draw by a clear margin on an "
        f"untrained model (prior {prior_best:.3f} vs "
        f"{float(result.best_score):.3f})")


def test_trajopt_deterministic():
    cfg, state, scene, condition = _setup()
    r1, c1 = plan_trajopt(cfg, state, scene, condition,
                          jax.random.PRNGKey(3), n_candidates=8, n_steps=5)
    r2, c2 = plan_trajopt(cfg, state, scene, condition,
                          jax.random.PRNGKey(3), n_candidates=8, n_steps=5)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(r1.best_traj),
                                  np.asarray(r2.best_traj))


def test_trajopt_batch_matches_single():
    cfg, state, scene, condition = _setup()
    scenes = jax.tree.map(lambda x: jnp.stack([x, x]), scene)
    conditions = jnp.stack([condition, condition])
    keys = jnp.stack([jax.random.PRNGKey(4), jax.random.PRNGKey(4)])
    rb, cb = plan_trajopt_batch(cfg, state, scenes, conditions, keys,
                                n_candidates=8, n_steps=4)
    rs, cs = plan_trajopt(cfg, state, scene, condition,
                          jax.random.PRNGKey(4), n_candidates=8, n_steps=4)
    np.testing.assert_allclose(np.asarray(cb[0]), np.asarray(cs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.best_score[0]),
                               np.asarray(rs.best_score),
                               rtol=1e-5, atol=1e-6)


def test_trajopt_quadrotor_family():
    # The motivating family: underactuated thrust-vectored dynamics where
    # one-shot waypoint plans are rarely dynamically consistent.  The
    # optimiser works through the cascaded controller + gravity dynamics.
    cfg = get_config("goalcond", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, n_candidates=32,
                     env="quadrotor")
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(7))
    condition = jnp.concatenate([scene.start, scene.goal])
    result, curve = plan_trajopt(cfg, state, scene, condition,
                                 jax.random.PRNGKey(8), n_candidates=8,
                                 n_steps=12)
    curve = np.asarray(curve)
    assert np.isfinite(curve).all()
    assert curve[-1] < curve[0]
    n = 8
    prior_best = float(jnp.min(result.scores[:n]))
    assert float(result.best_score) <= prior_best + 1e-6


def test_sharded_trajopt_matches_unsharded():
    from ndivplanning_tpu.parallel.mesh import make_mesh
    from ndivplanning_tpu.parallel.sharded_plan import make_sharded_trajopt
    from ndivplanning_tpu.parallel.sharded_step import shard_state

    cfg = _cfg(dp_shards=4, div_shards=2)
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(1))
    condition = rasterize_scene(scene, size=cfg.image_size)
    mesh = make_mesh(cfg=cfg)
    fn, _ = make_sharded_trajopt(cfg, mesh, n_candidates=16, n_steps=4)
    rs, cs = fn(shard_state(state, mesh), scene, condition,
                jax.random.PRNGKey(9))
    ru, cu = plan_trajopt(cfg, state, scene, condition,
                          jax.random.PRNGKey(9), n_candidates=16, n_steps=4)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(cu),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rs.best_score),
                               np.asarray(ru.best_score),
                               rtol=1e-5, atol=1e-6)
