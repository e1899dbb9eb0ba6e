"""Adversarial (GAN) losses — SURVEY.md §2 C5.

The exact variant in the reference is unknown (SURVEY §2 C5: "vanilla BCE vs
LSGAN/WGAN — unknown; pick one, make it a config switch"), so all three
common variants are provided and selected by ``Config.gan_loss``
(default: non-saturating BCE, the DCGAN-standard choice for small research
GANs).

All functions take raw discriminator *logits* and reduce with a mean.
Numerically-stable formulations only (softplus, never log(sigmoid)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------- BCE (NS-GAN)


def d_loss_bce(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Discriminator BCE loss: -log sig(real) - log(1 - sig(fake))."""
    return jnp.mean(jax.nn.softplus(-real_logits)) + jnp.mean(
        jax.nn.softplus(fake_logits)
    )


def g_loss_bce(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Non-saturating generator loss: -log sig(fake)."""
    return jnp.mean(jax.nn.softplus(-fake_logits))


# -------------------------------------------------------------------- LSGAN


def d_loss_lsgan(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Least-squares D loss: (D(real) - 1)^2 + D(fake)^2, halved."""
    return 0.5 * (
        jnp.mean(jnp.square(real_logits - 1.0)) + jnp.mean(jnp.square(fake_logits))
    )


def g_loss_lsgan(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Least-squares G loss: (D(fake) - 1)^2, halved."""
    return 0.5 * jnp.mean(jnp.square(fake_logits - 1.0))


# -------------------------------------------------------------------- hinge


def d_loss_hinge(real_logits: jnp.ndarray, fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Hinge D loss: relu(1 - D(real)) + relu(1 + D(fake))."""
    return jnp.mean(jax.nn.relu(1.0 - real_logits)) + jnp.mean(
        jax.nn.relu(1.0 + fake_logits)
    )


def g_loss_hinge(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Hinge G loss: -D(fake)."""
    return -jnp.mean(fake_logits)


GAN_LOSSES = {
    "bce": (d_loss_bce, g_loss_bce),
    "lsgan": (d_loss_lsgan, g_loss_lsgan),
    "hinge": (d_loss_hinge, g_loss_hinge),
}


def get_gan_losses(name: str):
    """Return (d_loss_fn, g_loss_fn) for a config-selected variant."""
    try:
        return GAN_LOSSES[name]
    except KeyError:
        raise ValueError(
            f"unknown gan_loss {name!r}; choose from {sorted(GAN_LOSSES)}"
        ) from None
