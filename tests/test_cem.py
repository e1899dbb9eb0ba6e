"""CEM latent-refinement planner tests (planning/cem.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.data.scenes import random_scene, rasterize_scene
from ndivplanning_tpu.planning.cem import plan_cem, plan_cem_batch
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


def test_cem_shapes_and_selection():
    cfg, state, scene, condition = _setup()
    result, curve = plan_cem(cfg, state, scene, condition,
                             jax.random.PRNGKey(2), n_candidates=32,
                             n_iters=4, n_diverse=4)
    assert result.taus.shape == (32, cfg.horizon, cfg.state_dim)
    assert curve.shape == (4,)
    assert float(result.best_score) == float(jnp.min(result.scores))
    assert np.isfinite(np.asarray(curve)).all()


def test_cem_best_curve_monotone_and_beats_prior():
    """Best-so-far is non-increasing, and the final best never loses to
    iteration 1 — which samples the N(0, I) prior, i.e. the one-shot
    planner's proposal distribution at the same population size."""
    cfg, state, scene, condition = _setup()
    result, curve = plan_cem(cfg, state, scene, condition,
                             jax.random.PRNGKey(3), n_candidates=64,
                             n_iters=6)
    curve = np.asarray(curve)
    assert (np.diff(curve) <= 1e-6).all(), curve
    # The returned population includes the tracked best at slot 0, so the
    # final best score can only improve on the curve's last value.
    assert float(result.best_score) <= curve[-1] + 1e-6


def test_cem_refinement_improves_over_single_iteration():
    """With a fresh (untrained) G, refining the 2-D latent for a few
    iterations should find strictly better scores than the prior draw on
    a typical scene (deterministic given the fixed key)."""
    cfg, state, scene, condition = _setup(seed=7)
    _, curve = plan_cem(cfg, state, scene, condition,
                        jax.random.PRNGKey(4), n_candidates=64, n_iters=8)
    curve = np.asarray(curve)
    assert curve[-1] < curve[0], curve


def test_cem_deterministic():
    cfg, state, scene, condition = _setup()
    r1, c1 = plan_cem(cfg, state, scene, condition, jax.random.PRNGKey(5),
                      n_candidates=32, n_iters=3)
    r2, c2 = plan_cem(cfg, state, scene, condition, jax.random.PRNGKey(5),
                      n_candidates=32, n_iters=3)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(r1.best_traj),
                                  np.asarray(r2.best_traj))


def test_cem_batch_matches_single():
    cfg, state, scene, condition = _setup()
    scenes = jax.tree.map(lambda x: jnp.stack([x, x]), scene)
    conditions = jnp.stack([condition, condition])
    keys = jnp.stack([jax.random.PRNGKey(6), jax.random.PRNGKey(6)])
    rb, cb = plan_cem_batch(cfg, state, scenes, conditions, keys,
                            n_candidates=16, n_iters=3)
    rs, cs = plan_cem(cfg, state, scene, condition, jax.random.PRNGKey(6),
                      n_candidates=16, n_iters=3)
    np.testing.assert_allclose(np.asarray(cb[0]), np.asarray(cs),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.best_score[0]),
                               np.asarray(rs.best_score),
                               rtol=1e-5, atol=1e-6)


def test_cem_default_budget_matches_one_shot():
    """Default population x (iterations + final population) ==
    cfg.n_candidates total rollouts — the scan's cem_iters populations
    PLUS the final selection population all count against the one-shot
    planner's budget."""
    cfg, state, scene, condition = _setup()
    result, curve = plan_cem(cfg, state, scene, condition,
                             jax.random.PRNGKey(8))
    assert curve.shape == (cfg.cem_iters,)
    n = max(cfg.n_candidates // (cfg.cem_iters + 1), 2)
    assert result.taus.shape[0] == n
    assert n * (cfg.cem_iters + 1) <= cfg.n_candidates
