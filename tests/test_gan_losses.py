"""GAN loss unit tests vs torch oracle (C5)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ndivplanning_tpu.ops.gan_losses import (
    GAN_LOSSES,
    d_loss_bce,
    d_loss_hinge,
    d_loss_lsgan,
    g_loss_bce,
    get_gan_losses,
)


def _logits(seed, n=64):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=n).astype(np.float32) * 3.0,
            rng.normal(size=n).astype(np.float32) * 3.0)


def test_bce_matches_torch():
    real, fake = _logits(0)
    bce = torch.nn.BCEWithLogitsLoss()
    want_d = float(
        bce(torch.from_numpy(real), torch.ones(64))
        + bce(torch.from_numpy(fake), torch.zeros(64)))
    got_d = float(d_loss_bce(jnp.asarray(real), jnp.asarray(fake)))
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5)

    want_g = float(bce(torch.from_numpy(fake), torch.ones(64)))
    got_g = float(g_loss_bce(jnp.asarray(fake)))
    np.testing.assert_allclose(got_g, want_g, rtol=1e-5)


def test_bce_stable_at_extreme_logits():
    real = jnp.asarray([1000.0, -1000.0])
    fake = jnp.asarray([-1000.0, 1000.0])
    assert np.isfinite(float(d_loss_bce(real, fake)))
    assert np.isfinite(float(g_loss_bce(fake)))


def test_lsgan_values():
    real = jnp.asarray([1.0, 1.0])
    fake = jnp.asarray([0.0, 0.0])
    assert float(d_loss_lsgan(real, fake)) == 0.0  # perfect D


def test_hinge_values():
    real = jnp.asarray([2.0])
    fake = jnp.asarray([-2.0])
    assert float(d_loss_hinge(real, fake)) == 0.0  # beyond margins


@pytest.mark.parametrize("name", sorted(GAN_LOSSES))
def test_registry(name):
    d_fn, g_fn = get_gan_losses(name)
    real, fake = _logits(1)
    assert np.isfinite(float(d_fn(jnp.asarray(real), jnp.asarray(fake))))
    assert np.isfinite(float(g_fn(jnp.asarray(fake))))


def test_unknown_raises():
    with pytest.raises(ValueError):
        get_gan_losses("wgan-gp")
