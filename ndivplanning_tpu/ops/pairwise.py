"""Pairwise L2 distance matrices.

The building block of the NDiv loss (SURVEY.md §3.2): for a set of k
vectors ``a[i] ∈ R^d``, compute ``D[i, j] = ||a[i] - a[j]||_2``.

TPU-first design notes
----------------------
The distance matrix is computed through the Gram matrix,

    ||a_i - a_j||^2 = ||a_i||^2 + ||a_j||^2 - 2 <a_i, a_j>,

so the O(k^2 d) work is a single ``einsum`` that XLA tiles onto the MXU,
instead of a broadcast-subtract-square-reduce graph that would materialise a
[k, k, d] intermediate in HBM.  The ``sqrt`` at exactly zero (the diagonal,
or coincident samples) has an undefined gradient; we guard it with the
standard double-``where`` trick so both the value and the VJP are exactly 0
there — the same subgradient convention the fused Pallas kernel uses
(SURVEY.md §7 "hard parts" #2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sq_l2(a: jnp.ndarray) -> jnp.ndarray:
    """Squared pairwise L2 distances.

    Args:
      a: ``[..., k, d]`` array of k vectors (leading batch dims allowed).

    Returns:
      ``[..., k, k]`` matrix of squared distances, exact zeros on the
      diagonal, clamped at 0 against catastrophic cancellation.
    """
    sq = jnp.sum(a * a, axis=-1)
    # HIGHEST precision: the TPU MXU's default bf16 accumulation is not
    # accurate enough for distance parity with the f32 oracle paths.
    gram = jnp.einsum(
        "...id,...jd->...ij", a, a, precision=jax.lax.Precision.HIGHEST
    )
    d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * gram
    d2 = jnp.maximum(d2, 0.0)
    # Exact zeros on the diagonal (cancellation can leave tiny residue).
    k = a.shape[-2]
    eye = jnp.eye(k, dtype=bool)
    return jnp.where(eye, 0.0, d2)


def pairwise_l2(a: jnp.ndarray) -> jnp.ndarray:
    """Pairwise L2 distances with a zero-safe gradient.

    Args:
      a: ``[..., k, d]`` array.

    Returns:
      ``[..., k, k]`` distance matrix.  At entries where the distance is
      exactly 0 (diagonal / coincident points) both the value and the
      gradient are 0 (subgradient convention).
    """
    d2 = pairwise_sq_l2(a)
    pos = d2 > 0.0
    safe = jnp.where(pos, d2, 1.0)
    return jnp.where(pos, jnp.sqrt(safe), 0.0)
