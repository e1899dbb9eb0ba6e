"""bf16 compute-dtype option: trains, stays finite, params stay f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.train.state import build_models, create_train_state
from ndivplanning_tpu.train.step import train_step_fused
from ndivplanning_tpu.utils.config import get_config


def _cfg(preset="goalcond", **kw):
    d = dict(batch_size=8, k=4, g_hidden=(32,), d_hidden=(32,),
             cond_embed_dim=8, image_size=16, compute_dtype="bf16")
    d.update(kw)
    return get_config(preset, **d)


@pytest.mark.parametrize("preset", ["pointmass2d", "goalcond", "imagecond"])
def test_bf16_trains_finite(preset):
    cfg = _cfg(preset)
    state = create_train_state(cfg)
    for _ in range(5):
        state, metrics = train_step_fused(cfg, state)
    for name, v in metrics.items():
        assert np.isfinite(float(v)), name


def test_params_stay_f32_outputs_f32():
    cfg = _cfg()
    state = create_train_state(cfg)
    for leaf in jax.tree.leaves(state.g_params):
        assert leaf.dtype == jnp.float32
    gen, disc = build_models(cfg)
    cond = jnp.zeros((2, 4))
    z = jnp.zeros((2, cfg.k, cfg.latent_dim))
    traj = gen.apply(state.g_params, cond, z)
    assert traj.dtype == jnp.float32  # cast back before NDiv/env math
    logits = disc.apply(state.d_params, cond, traj)
    assert logits.dtype == jnp.float32


def test_bf16_close_to_f32_initially():
    cfg16, cfg32 = _cfg(), _cfg(compute_dtype="f32")
    s16, s32 = create_train_state(cfg16), create_train_state(cfg32)
    gen16, _ = build_models(cfg16)
    gen32, _ = build_models(cfg32)
    cond = jnp.ones((2, 4)) * 0.3
    z = jnp.ones((2, cfg16.k, cfg16.latent_dim)) * 0.5
    t16 = gen16.apply(s16.g_params, cond, z)
    t32 = gen32.apply(s32.g_params, cond, z)
    # Same f32 params (same seed), bf16 rounding only.
    np.testing.assert_allclose(np.asarray(t16), np.asarray(t32),
                               rtol=0.05, atol=0.02)


def test_unknown_dtype_raises():
    cfg = _cfg(compute_dtype="fp8")
    with pytest.raises(ValueError):
        create_train_state(cfg)
