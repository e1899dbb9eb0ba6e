"""Normalized Diversification (NDiv) loss.

The core novelty of the reference repo (SURVEY.md §2 C4, §3.2; math from
Liu, Zhang, Wangni, Shi — "Normalized Diversification", CVPR 2019).  For k
diversity samples per condition, with latents ``z: [k, dz]`` and generated
outputs (flattened trajectories) ``x: [k, dx]``:

    Dz[i, j] = ||z_i - z_j||            Dx[i, j] = ||x_i - x_j||
    nz[i, j] = Dz[i, j] / sum_j Dz[i, j]     (row-normalised; diag excluded
    nx[i, j] = Dx[i, j] / sum_j Dx[i, j]      implicitly since Dii = 0)
    L        = mean_{i != j}  max(0, alpha * nz[i, j] - nx[i, j])

The hinge demands that the *relative* spread of the outputs keeps up with
the relative spread of the latents, preventing mode collapse.

Two implementations, value/grad parity-tested against each other and an
independent torch oracle (SURVEY.md §4):

- :func:`ndiv_loss_reference` — pure jnp.  XLA fuses this well already; it
  is the fallback below the Pallas size threshold and on non-TPU backends.
- :func:`ndiv_loss` — dispatching front door; uses the fused Pallas kernel
  (``ndiv_pallas.py``) on TPU when shapes warrant it.

Zero-safety conventions (shared by all implementations and the hand-derived
VJP, SURVEY.md §7 hard-parts #1/#2):
- d sqrt(u)/du at u=0 is taken as 0,
- rows with zero distance-sum normalise to 0 (0/0 := 0),
- relu' (hinge subgradient) at exactly 0 is taken as 0 (strict >).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ndivplanning_tpu.ops.pairwise import pairwise_l2

DEFAULT_ALPHA = 0.8


def _row_normalize(d: jnp.ndarray) -> jnp.ndarray:
    """Row-normalise a distance matrix; all-zero rows map to zero rows."""
    rowsum = jnp.sum(d, axis=-1, keepdims=True)
    pos = rowsum > 0.0
    safe = jnp.where(pos, rowsum, 1.0)
    return jnp.where(pos, d / safe, 0.0)


def normalized_pairwise_l2(a: jnp.ndarray) -> jnp.ndarray:
    """Row-normalised pairwise distance matrix ``D / rowsum(D)``."""
    return _row_normalize(pairwise_l2(a))


def ndiv_loss_reference(
    z: jnp.ndarray,
    x: jnp.ndarray,
    alpha: float = DEFAULT_ALPHA,
) -> jnp.ndarray:
    """Pure-jnp NDiv hinge loss.

    Args:
      z: ``[..., k, dz]`` latent draws (k diversity samples per condition).
      x: ``[..., k, dx]`` generator outputs, trajectories flattened to
        vectors, same leading dims as ``z``.
      alpha: hinge slope on the latent spread (paper default 0.8).

    Returns:
      Scalar: mean over all conditions and ordered pairs i != j of
      ``relu(alpha * nz - nx)``.
    """
    if z.shape[:-1] != x.shape[:-1]:
        raise ValueError(
            f"z and x must agree on leading/k dims, got {z.shape} vs {x.shape}"
        )
    k = z.shape[-2]
    if k < 2:
        raise ValueError(f"need k >= 2 diversity samples, got k={k}")
    nz = normalized_pairwise_l2(z)
    nx = normalized_pairwise_l2(x)
    # Hinge via where(slack > 0), NOT jnp.maximum: maximum's autodiff
    # subgradient at an exact tie is 0.5, which would break the strict->
    # convention the hand-derived Pallas VJP uses (ADVICE round-1).
    slack = alpha * nz - nx
    hinge = jnp.where(slack > 0.0, slack, 0.0)
    off_diag = ~jnp.eye(k, dtype=bool)
    total = jnp.sum(jnp.where(off_diag, hinge, 0.0))
    n_conditions = hinge.size // (k * k)
    return total / (n_conditions * k * (k - 1))


@functools.partial(jax.jit, static_argnames=("alpha", "impl"))
def ndiv_loss(
    z: jnp.ndarray,
    x: jnp.ndarray,
    alpha: float = DEFAULT_ALPHA,
    impl: str = "auto",
) -> jnp.ndarray:
    """NDiv loss front door: fused Pallas kernel on TPU, jnp elsewhere.

    ``impl``: "auto" | "pallas" | "jnp".  "auto" picks the Pallas kernel on
    TPU backends (it is bitwise self-consistent run-to-run; parity with the
    jnp path is within float tolerance — SURVEY.md §7 hard-parts #1).
    """
    if impl == "jnp":
        return ndiv_loss_reference(z, x, alpha)
    # Imported lazily to keep non-TPU import paths light.
    from ndivplanning_tpu.ops import ndiv_pallas

    if impl == "pallas":
        return ndiv_pallas.ndiv_loss_fused(z, x, alpha)
    # auto
    if jax.default_backend() == "tpu":
        return ndiv_pallas.ndiv_loss_fused(z, x, alpha)
    return ndiv_loss_reference(z, x, alpha)
