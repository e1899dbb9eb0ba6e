"""Model shape/init tests (C1-C3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.models.conditioning import (
    ConditionEncoder,
    condition_input_example,
)
from ndivplanning_tpu.train.state import build_models, create_train_state, param_count
from ndivplanning_tpu.utils.config import get_config


@pytest.mark.parametrize("preset", ["pointmass2d", "goalcond", "imagecond"])
def test_generator_discriminator_shapes(preset):
    cfg = get_config(preset, batch_size=4, k=3)
    gen, disc = build_models(cfg)
    key = jax.random.PRNGKey(0)
    cond = condition_input_example(cfg.conditioning, 4, cfg.image_size)
    z = jnp.zeros((4, 3, cfg.latent_dim))
    g_params = gen.init(key, cond, z)
    traj = gen.apply(g_params, cond, z)
    assert traj.shape == (4, 3, cfg.horizon, cfg.state_dim)

    d_params = disc.init(key, cond, traj[:, 0])
    real_logits = disc.apply(d_params, cond, traj[:, 0])
    assert real_logits.shape == (4,)
    fake_logits = disc.apply(d_params, cond, traj)
    assert fake_logits.shape == (4, 3)


def test_sigmoid_output_in_bounds():
    cfg = get_config("goalcond", batch_size=4, k=2)
    gen, _ = build_models(cfg)
    key = jax.random.PRNGKey(1)
    cond = jax.random.uniform(key, (4, 4))
    z = jax.random.normal(key, (4, 2, cfg.latent_dim)) * 10.0
    params = gen.init(key, cond, z)
    traj = gen.apply(params, cond, z)
    assert float(jnp.min(traj)) >= 0.0 and float(jnp.max(traj)) <= 1.0


def test_condition_encoder_modes():
    key = jax.random.PRNGKey(0)
    for mode, shape in [("none", (5, 0)), ("startgoal", (5, 64)),
                        ("image", (5, 64))]:
        enc = ConditionEncoder(mode=mode, embed_dim=64)
        x = condition_input_example(mode, 5)
        params = enc.init(key, x)
        out = enc.apply(params, x)
        assert out.shape == shape


def test_latents_change_output():
    cfg = get_config("pointmass2d", batch_size=2, k=2)
    gen, _ = build_models(cfg)
    key = jax.random.PRNGKey(2)
    cond = jnp.zeros((2, 0))
    z1 = jax.random.normal(key, (2, 2, cfg.latent_dim))
    params = gen.init(key, cond, z1)
    t1 = gen.apply(params, cond, z1)
    t2 = gen.apply(params, cond, z1 + 1.0)
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_create_train_state_deterministic():
    cfg = get_config("pointmass2d", batch_size=4)
    s1 = create_train_state(cfg)
    s2 = create_train_state(cfg)
    for a, b in zip(jax.tree.leaves(s1.g_params), jax.tree.leaves(s2.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert param_count(s1.g_params) > 0
