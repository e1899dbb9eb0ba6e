"""Transformer generator family (models/transformer.py, g_arch switch).

The MLP family's contract tests (shapes, determinism, train-step
integration, planning) re-run against the attention generator — the
family swap must be invisible to every consumer of ConditionedGenerator.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.train.state import create_train_state, gen_params
from ndivplanning_tpu.utils.config import get_config


def _cfg(**kw):
    base = dict(g_arch="transformer", g_tf_dim=32, g_tf_layers=2,
                g_tf_heads=2, batch_size=8, k=4, cond_embed_dim=16,
                d_hidden=(32,))
    base.update(kw)
    return get_config("goalcond", **base)


def test_shapes_finite_deterministic():
    cfg = _cfg()
    state = create_train_state(cfg)
    conds = jnp.zeros((8, 4), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, cfg.k, cfg.latent_dim))
    from ndivplanning_tpu.train.state import build_models

    gen, _ = build_models(cfg)
    out1 = gen.apply(state.g_params, conds, z)
    out2 = gen.apply(state.g_params, conds, z)
    assert out1.shape == (8, cfg.k, cfg.horizon, cfg.state_dim)
    assert np.all(np.isfinite(np.asarray(out1)))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_unknown_arch_rejected():
    cfg = get_config("pointmass2d", g_arch="bogus", batch_size=4, k=4)
    with pytest.raises(ValueError, match="g_arch"):
        create_train_state(cfg)


def test_train_step_runs_and_learns_direction():
    """200 fused steps with the transformer G: finite losses, params
    move, EMA tracks — the full C8 step works unchanged on the family."""
    from ndivplanning_tpu.train.step import train_chunk

    cfg = _cfg(g_ema_decay=0.99)
    state = create_train_state(cfg)
    p0 = jax.tree.leaves(state.g_params)[0].copy()
    state, metrics = train_chunk(cfg, state, 200)
    assert int(state.step) == 200
    for name in ("d_loss", "g_adv", "g_ndiv", "g_total"):
        assert np.all(np.isfinite(np.asarray(metrics[name])))
    assert not np.allclose(np.asarray(jax.tree.leaves(state.g_params)[0]),
                           np.asarray(p0))
    # EMA started as a copy and must have tracked the moving params.
    ema = jax.tree.leaves(state.g_ema_params)[0]
    live = jax.tree.leaves(state.g_params)[0]
    assert not np.allclose(np.asarray(ema), np.asarray(p0))
    assert not np.allclose(np.asarray(ema), np.asarray(live))


def test_planner_and_eval_run_on_family():
    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.planning.planner import plan
    from ndivplanning_tpu.train.evaluate import evaluate_fixed

    cfg = _cfg(n_candidates=16)
    state = create_train_state(cfg)
    scene = random_scene(jax.random.PRNGKey(0))
    cond = jnp.concatenate([scene.start, scene.goal])
    result = plan(cfg, state, scene, cond, jax.random.PRNGKey(1),
                  n_candidates=16, n_diverse=4)
    assert np.isfinite(float(result.best_score))
    ev = evaluate_fixed(cfg, state, n_scenes=32)
    assert 0.0 <= float(ev["eval_success_rate"]) <= 1.0


def test_bf16_compute_path():
    cfg = _cfg(compute_dtype="bf16")
    state = create_train_state(cfg)
    conds = jnp.zeros((8, 4), jnp.float32)
    z = jax.random.normal(jax.random.PRNGKey(2), (8, cfg.k, cfg.latent_dim))
    from ndivplanning_tpu.train.state import build_models

    gen, _ = build_models(cfg)
    out = gen.apply(gen_params(cfg, state), conds, z)
    # Head casts back to f32 for NDiv/env math regardless of compute.
    assert out.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out)))


def test_checkpoint_roundtrip_family(tmp_path):
    from ndivplanning_tpu.utils import checkpoint as ckpt

    cfg = _cfg()
    state = create_train_state(cfg)
    ckpt.save_checkpoint(str(tmp_path), state)
    restored = ckpt.restore_latest(str(tmp_path), create_train_state(cfg))
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.g_params)[0]),
        np.asarray(jax.tree.leaves(state.g_params)[0]))
