"""Core numeric ops: pairwise distances, NDiv loss (jnp + Pallas), GAN losses."""

from ndivplanning_tpu.ops.pairwise import pairwise_l2
from ndivplanning_tpu.ops.ndiv import ndiv_loss, ndiv_loss_reference
from ndivplanning_tpu.ops.gan_losses import (
    d_loss_bce,
    g_loss_bce,
    d_loss_lsgan,
    g_loss_lsgan,
    d_loss_hinge,
    g_loss_hinge,
)

__all__ = [
    "pairwise_l2",
    "ndiv_loss",
    "ndiv_loss_reference",
    "d_loss_bce",
    "g_loss_bce",
    "d_loss_lsgan",
    "g_loss_lsgan",
    "d_loss_hinge",
    "g_loss_hinge",
]
