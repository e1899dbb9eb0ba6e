"""Evaluation metrics (C10) and sim-in-the-loop planner (L5) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.data.scenes import random_scene, rasterize_scene
from ndivplanning_tpu.planning.planner import plan
from ndivplanning_tpu.train.evaluate import evaluate
from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.utils.config import get_config


def _cfg(preset="pointmass2d", **kw):
    d = dict(batch_size=8, k=4, g_hidden=(32,), d_hidden=(32,),
             cond_embed_dim=8, image_size=16)
    d.update(kw)
    return get_config(preset, **d)


def test_evaluate_returns_finite_scalars():
    cfg = _cfg()
    state = create_train_state(cfg)
    out = evaluate(cfg, state, jax.random.PRNGKey(0), eval_batch=8)
    expected = {"eval_mean_pairwise_dist", "eval_ndiv", "eval_endpoint_err",
                "eval_success_rate", "eval_collision_rate", "eval_mean_score",
                "eval_mode_coverage"}
    assert set(out) == expected
    for k, v in out.items():
        assert np.isfinite(float(v)), k
    assert 0.0 <= float(out["eval_success_rate"]) <= 1.0
    assert 0.0 < float(out["eval_mode_coverage"]) <= 1.0


def test_mode_coverage_detects_collapse():
    # A generator collapsed to one output must score coverage 1/8.
    import jax.numpy as jnp

    cfg = _cfg()
    state = create_train_state(cfg)
    zeroed = jax.tree.map(jnp.zeros_like, state.g_params)
    state = state.replace(g_params=zeroed)  # all-zero G -> constant output
    out = evaluate(cfg, state, jax.random.PRNGKey(0), eval_batch=8)
    np.testing.assert_allclose(float(out["eval_mode_coverage"]), 1.0 / 8)


def test_plan_shapes_and_selection():
    cfg = _cfg("planning", n_candidates=64)
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(1))
    condition = rasterize_scene(scene, size=cfg.image_size)
    result = plan(cfg, state, scene, condition, jax.random.PRNGKey(2),
                  n_candidates=64, n_diverse=4)
    assert result.taus.shape == (64, cfg.horizon, cfg.state_dim)
    assert result.scores.shape == (64,)
    # Best really is the argmin.
    assert float(result.best_score) == float(jnp.min(result.scores))
    # Diverse set: unique indices from the better half.
    idx = np.asarray(result.diverse_idx)
    assert len(set(idx.tolist())) == 4


def test_plan_batch_matches_individual():
    import jax.numpy as jnp

    from ndivplanning_tpu.data.scenes import random_scene_batch, rasterize_batch
    from ndivplanning_tpu.planning.planner import plan_batch

    cfg = _cfg("planning", n_candidates=16)
    state = create_train_state(cfg)
    scenes = random_scene_batch(jax.random.PRNGKey(0), 4)
    conditions = rasterize_batch(scenes, size=cfg.image_size)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    batch = plan_batch(cfg, state, scenes, conditions, keys,
                       n_candidates=16, n_diverse=4)
    assert batch.best_traj.shape == (4, cfg.horizon, cfg.state_dim)
    # Element 2 equals an individual plan with the same key.
    one = plan(cfg, state, jax.tree.map(lambda a: a[2], scenes),
               conditions[2], keys[2], n_candidates=16, n_diverse=4)
    np.testing.assert_allclose(float(batch.best_score[2]),
                               float(one.best_score), rtol=1e-5)


def test_diverse_top_m_clamped_to_pool():
    # n_diverse > half the candidates: indices must stay distinct (the
    # selection clamps to the better-scoring half rather than padding
    # with repeats).
    cfg = _cfg("pointmass2d", n_candidates=10)
    state = create_train_state(cfg)
    from ndivplanning_tpu.data.scenes import random_scene

    scene = random_scene(jax.random.PRNGKey(5))
    result = plan(cfg, state, scene, jnp.zeros((0,), jnp.float32),
                  jax.random.PRNGKey(6), n_candidates=10, n_diverse=8)
    idx = np.asarray(result.diverse_idx)
    assert len(idx) == 5  # clamped to the pool (half of 10)
    assert len(set(idx.tolist())) == len(idx)


def test_plan_unconditioned_mode():
    cfg = _cfg("pointmass2d", n_candidates=32)
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(3))
    condition = jnp.zeros((0,), jnp.float32)
    result = plan(cfg, state, scene, condition, jax.random.PRNGKey(4),
                  n_candidates=32, n_diverse=4)
    assert np.all(np.isfinite(np.asarray(result.scores)))


def test_fixed_eval_suite_reproducible():
    """VERDICT round-1 #7: the frozen eval protocol must reproduce to the
    digit across calls and be independent of the training seed."""
    from ndivplanning_tpu.train.evaluate import evaluate_fixed
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils.config import get_config

    cfg_a = get_config("goalcond", batch_size=8, k=4, g_hidden=(32,),
                       d_hidden=(32,), cond_embed_dim=8, seed=0)
    state = create_train_state(cfg_a)
    out1 = {k: float(v) for k, v in
            evaluate_fixed(cfg_a, state, n_scenes=64).items()}
    out2 = {k: float(v) for k, v in
            evaluate_fixed(cfg_a, state, n_scenes=64).items()}
    assert out1 == out2  # bitwise: same program, same frozen inputs

    # Same params evaluated under a different TRAINING seed config must
    # still see the identical suite (suite keys are training-seed-free).
    cfg_b = get_config("goalcond", batch_size=8, k=4, g_hidden=(32,),
                       d_hidden=(32,), cond_embed_dim=8, seed=123)
    state_b = state.replace(rng=create_train_state(cfg_b).rng)
    out3 = {k: float(v) for k, v in
            evaluate_fixed(cfg_b, state_b, n_scenes=64).items()}
    assert out1 == out3


def test_eval_suite_cache_shared_across_irrelevant_fields():
    """Round-2 verdict weak #4: configs differing only in fields the
    suite does not depend on (workdir/steps/lr_schedule/seed) must share
    ONE cache slot — an imagecond suite is ~200 MB per slot."""
    from ndivplanning_tpu.train.evaluate import make_eval_suite
    from ndivplanning_tpu.utils.config import get_config

    cfg_a = get_config("goalcond", workdir="/tmp/a", steps=100, seed=0)
    cfg_b = get_config("goalcond", workdir="/tmp/b", steps=999, seed=7,
                       lr_schedule="cosine")
    suite_a = make_eval_suite(cfg_a, n_scenes=32)
    suite_b = make_eval_suite(cfg_b, n_scenes=32)
    # Same object, not merely equal arrays: one cache entry.
    assert jax.tree.leaves(suite_a)[0] is jax.tree.leaves(suite_b)[0]

    # But a field the suite DOES depend on still splits the cache.
    cfg_c = get_config("goalcond", workdir="/tmp/a", horizon=cfg_a.horizon + 1)
    suite_c = make_eval_suite(cfg_c, n_scenes=32)
    assert suite_c.real_traj.shape != suite_a.real_traj.shape


def test_fixed_mpc_eval_reproducible_and_suite_scale():
    """Closed-loop frozen-suite eval (evaluate_fixed_mpc): fixed
    per-scene keys make it digit-reproducible like the open-loop suite,
    and the rates are valid fractions over the whole suite."""
    from ndivplanning_tpu.train.evaluate import evaluate_fixed_mpc

    cfg = _cfg("goalcond")
    state = create_train_state(cfg)
    out1 = evaluate_fixed_mpc(cfg, state, n_scenes=8, total_steps=8,
                              replan_every=4, n_candidates=8)
    out2 = evaluate_fixed_mpc(cfg, state, n_scenes=8, total_steps=8,
                              replan_every=4, n_candidates=8)
    assert out1 == out2
    assert 0.0 <= out1["eval_mpc_success_rate"] <= 1.0
    assert 0.0 <= out1["eval_mpc_collision_rate"] <= 1.0
    assert out1["eval_mpc_total_steps"] == 8.0
