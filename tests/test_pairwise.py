"""Unit tests for pairwise L2 distances (SURVEY.md §4 unit/math level)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.ops.pairwise import pairwise_l2, pairwise_sq_l2


@pytest.mark.parametrize("k,d", [(2, 1), (8, 2), (32, 64), (5, 3)])
def test_matches_numpy_oracle(k, d):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(k, d)).astype(np.float32)
    expected = np.linalg.norm(a[:, None, :] - a[None, :, :], axis=-1)
    got = np.asarray(pairwise_l2(jnp.asarray(a)))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_batched():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(4, 6, 3)).astype(np.float32)
    got = np.asarray(pairwise_l2(jnp.asarray(a)))
    for b in range(4):
        expected = np.linalg.norm(a[b][:, None] - a[b][None, :], axis=-1)
        np.testing.assert_allclose(got[b], expected, rtol=1e-5, atol=1e-5)


def test_diagonal_exact_zero():
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32)) * 1e3
    d = pairwise_l2(a)
    assert np.all(np.diag(np.asarray(d)) == 0.0)
    d2 = pairwise_sq_l2(a)
    assert np.all(np.diag(np.asarray(d2)) == 0.0)


def test_grad_zero_safe_at_coincident_points():
    # Two identical points: distance 0, gradient must be 0 (not NaN).
    a = jnp.array([[1.0, 2.0], [1.0, 2.0], [3.0, 4.0]])
    g = jax.grad(lambda t: jnp.sum(pairwise_l2(t)))(a)
    assert np.all(np.isfinite(np.asarray(g)))


def test_symmetry_and_nonnegativity():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(12, 5)).astype(np.float32))
    d = np.asarray(pairwise_l2(a))
    np.testing.assert_allclose(d, d.T, rtol=1e-6)
    assert np.all(d >= 0)
