"""iLQR planner tests (planning/ilqr.py) + CEM->trajopt hybrid."""

import jax
import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.data.scenes import random_scene, rasterize_scene
from ndivplanning_tpu.envs.registry import get_env
from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.planning.ilqr import (
    _ilqr_refine,
    _state_codec,
    plan_ilqr,
    plan_ilqr_batch,
)
from ndivplanning_tpu.planning.grad_refine import SoftWeights
from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.utils.config import get_config


def _cfg(**kw):
    d = dict(batch_size=8, k=4, g_hidden=(32,), d_hidden=(32,),
             cond_embed_dim=8, image_size=16, n_candidates=64, horizon=16)
    d.update(kw)
    return get_config("planning", **d)


def _setup(seed=1, **kw):
    cfg = _cfg(**kw)
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(seed))
    condition = rasterize_scene(scene, size=cfg.image_size)
    return cfg, state, scene, condition


def test_state_codec_roundtrips_every_family():
    scene = Scene.create([0.2, 0.2], [0.8, 0.8])
    for name in ("pointmass", "unicycle", "reacher", "quadrotor", "arm3"):
        api = get_env(name)
        st = api.reset(api.make_params(), scene)
        ravel, unravel, pos_slice, dim = _state_codec(st)
        x = ravel(st)
        assert x.shape == (dim,)
        back = unravel(x, st)
        for leaf_a, leaf_b in zip(jax.tree.leaves(st), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(leaf_a),
                                          np.asarray(leaf_b))
        np.testing.assert_array_equal(np.asarray(x[pos_slice]),
                                      np.asarray(st.pos))


def test_ilqr_refine_monotone_and_reaches_pointmass():
    """From a DO-NOTHING action sequence, iLQR on the point mass must
    drive to the goal (quadratic terminal cost, linear-ish dynamics —
    the sanity regime where iLQR is near-exact)."""
    cfg = _cfg()
    scene = Scene.create([0.2, 0.2], [0.8, 0.8])
    u0 = jnp.zeros((cfg.horizon, 2))
    u_star, positions, curve = _ilqr_refine(cfg, scene, u0, 10,
                                            SoftWeights(), 1.0)
    curve = np.asarray(curve)
    assert np.isfinite(curve).all()
    # Alpha-0 line search guarantees per-iteration non-increase.
    assert (np.diff(curve) <= 1e-6).all()
    # Large descent; the floor is the irreducible control energy of
    # crossing the box, not a solver gap.
    assert curve[-1] < 0.15 * curve[0]
    final = np.asarray(positions)[-1]
    assert np.linalg.norm(final - np.asarray(scene.goal)) < 0.04


def test_ilqr_refine_quadrotor_descends():
    """The underactuated family: hover-ish warm start, iLQR must still
    make major progress (second-order updates through gravity +
    attitude dynamics — the regime first-order trajopt measured as a
    negative)."""
    cfg = _cfg(env="quadrotor", horizon=32)
    scene = Scene.create([0.2, 0.2], [0.8, 0.8])
    u0 = jnp.full((cfg.horizon, 2), 0.25)  # per-rotor hover thrust
    _, positions, curve = _ilqr_refine(cfg, scene, u0, 15, SoftWeights(),
                                       1.0)
    curve = np.asarray(curve)
    assert np.isfinite(curve).all()
    assert (np.diff(curve) <= 1e-6).all()
    # The real claim: iLQR FLIES the underactuated plant to the goal
    # (measured final dist 0.003 vs goal radius 0.05; the remaining cost
    # is control energy).  First-order trajopt never managed this
    # (BASELINE.md r3j).
    final = np.asarray(positions)[-1]
    assert np.linalg.norm(final - np.asarray(scene.goal)) < 0.02
    assert np.isfinite(np.asarray(positions)).all()


def test_plan_ilqr_union_never_loses_to_prior():
    cfg, state, scene, condition = _setup()
    result, curve = plan_ilqr(cfg, state, scene, condition,
                              jax.random.PRNGKey(2), n_candidates=4,
                              n_iters=6)
    n = 4
    assert result.taus.shape == (2 * n, cfg.horizon, cfg.state_dim)
    prior_best = float(jnp.min(jnp.where(
        jnp.isfinite(result.scores[:n]), result.scores[:n], jnp.inf)))
    assert float(result.best_score) <= prior_best + 1e-6
    assert np.isfinite(np.asarray(curve)).all()


def test_plan_ilqr_batch_matches_single():
    cfg, state, scene, condition = _setup()
    keys = jax.random.split(jax.random.PRNGKey(3), 2)
    scenes = jax.tree.map(lambda a: jnp.stack([a, a]), scene)
    conds = jnp.stack([condition, condition])
    batch, _ = plan_ilqr_batch(cfg, state, scenes, conds, keys,
                               n_candidates=4, n_iters=4)
    single, _ = plan_ilqr(cfg, state, scene, condition, keys[0],
                          n_candidates=4, n_iters=4)
    np.testing.assert_allclose(np.asarray(batch.best_score[0]),
                               np.asarray(single.best_score), rtol=1e-4)


def test_cem_trajopt_never_loses_to_cem():
    from ndivplanning_tpu.planning.cem import plan_cem
    from ndivplanning_tpu.planning.trajopt import plan_cem_trajopt

    cfg, state, scene, condition = _setup()
    key = jax.random.PRNGKey(4)
    hybrid, curve = plan_cem_trajopt(cfg, state, scene, condition, key,
                                     n_steps=8)
    cem, _ = plan_cem(cfg, state, scene, condition, key)
    # Same key -> identical CEM stage; the hybrid refines its top
    # survivors and union-selects, so it can only improve on CEM.
    assert float(hybrid.best_score) <= float(cem.best_score) + 1e-6
    assert np.isfinite(np.asarray(curve)).all()


def test_cli_refine_choices_parse():
    from ndivplanning_tpu.cli import main
    import pytest

    # argparse rejects unknown refine modes with SystemExit(2).
    with pytest.raises(SystemExit):
        main(["plan", "--refine", "bogus"])
