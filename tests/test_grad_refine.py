"""Gradient latent-refinement planner tests (planning/grad_refine.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.planning.grad_refine import (
    SoftWeights,
    _segments_penetration,
    plan_grad,
    plan_grad_batch,
)
from ndivplanning_tpu.data.scenes import random_scene, rasterize_scene
from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.utils.config import get_config


def _cfg(**kw):
    d = dict(batch_size=8, k=4, g_hidden=(32,), d_hidden=(32,),
             cond_embed_dim=8, image_size=16, n_candidates=64)
    d.update(kw)
    return get_config("planning", **d)


def _setup(seed=1):
    cfg = _cfg()
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(seed))
    condition = rasterize_scene(scene, size=cfg.image_size)
    return cfg, state, scene, condition


def test_penetration_geometry():
    scene = Scene.create([0.0, 0.5], [1.0, 0.5], [[0.5, 0.5, 0.1]])
    # A path cutting through the disc penetrates; one far away doesn't.
    # (Off-centre: at the exact centre dist=0 makes the direction, hence
    # the gradient, degenerate-zero — measure-zero in practice.)
    through = jnp.asarray([[0.5, 0.55], [1.0, 0.55]])
    clear = jnp.asarray([[0.0, 0.9], [1.0, 0.9]])
    p_through = _segments_penetration(scene, scene.start, through, 0.0)
    p_clear = _segments_penetration(scene, scene.start, clear, 0.0)
    assert float(p_through) > 0.05
    assert float(p_clear) == 0.0
    # Differentiable: nonzero gradient w.r.t. a penetrating path.
    g = jax.grad(lambda p: _segments_penetration(scene, scene.start, p,
                                                 0.0))(through)
    assert np.abs(np.asarray(g)).sum() > 0


def test_grad_refine_descends_and_never_loses_to_prior():
    cfg, state, scene, condition = _setup()
    result, curve = plan_grad(cfg, state, scene, condition,
                              jax.random.PRNGKey(2), n_candidates=16,
                              n_steps=10)
    curve = np.asarray(curve)
    assert np.isfinite(curve).all()
    # Adam on the soft objective should make net progress.
    assert curve[-1] < curve[0]
    # Union selection: best over prior+refined <= best over prior alone.
    n = 16
    prior_best = float(jnp.min(result.scores[:n]))
    assert float(result.best_score) <= prior_best + 1e-6
    assert result.taus.shape == (2 * n, cfg.horizon, cfg.state_dim)


def test_grad_refine_deterministic():
    cfg, state, scene, condition = _setup()
    r1, c1 = plan_grad(cfg, state, scene, condition, jax.random.PRNGKey(3),
                       n_candidates=8, n_steps=5)
    r2, c2 = plan_grad(cfg, state, scene, condition, jax.random.PRNGKey(3),
                       n_candidates=8, n_steps=5)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(r1.best_traj),
                                  np.asarray(r2.best_traj))


def test_grad_refine_batch_matches_single():
    cfg, state, scene, condition = _setup()
    scenes = jax.tree.map(lambda x: jnp.stack([x, x]), scene)
    conditions = jnp.stack([condition, condition])
    keys = jnp.stack([jax.random.PRNGKey(4), jax.random.PRNGKey(4)])
    rb, cb = plan_grad_batch(cfg, state, scenes, conditions, keys,
                             n_candidates=8, n_steps=4)
    rs, cs = plan_grad(cfg, state, scene, condition, jax.random.PRNGKey(4),
                       n_candidates=8, n_steps=4)
    np.testing.assert_allclose(np.asarray(cb[0]), np.asarray(cs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.best_score[0]),
                               np.asarray(rs.best_score),
                               rtol=1e-5, atol=1e-6)


def test_soft_weights_static_hashable():
    w1 = SoftWeights(obstacle=5.0)
    w2 = SoftWeights(obstacle=5.0)
    assert hash(w1) == hash(w2) and w1 == w2
    assert w1.obstacle == 5.0 and w1.margin == 0.02
