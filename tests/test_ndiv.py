"""NDiv loss: jnp reference vs independent torch oracle, values AND grads.

SURVEY.md §4 unit/math level: "Pallas kernel == pure-jnp reference ==
independent torch/NumPy oracle, values AND gradients".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ndivplanning_tpu.ops.ndiv import ndiv_loss_reference
from oracle.torch_oracle import ndiv_loss_torch


def _random_case(seed, b, k, dz, dx):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(b, k, dz)).astype(np.float32)
    x = rng.normal(size=(b, k, dx)).astype(np.float32)
    return z, x


@pytest.mark.parametrize(
    "b,k,dz,dx",
    [(1, 2, 1, 1), (4, 8, 2, 64), (2, 32, 2, 64), (3, 5, 3, 7), (1, 64, 16, 128)],
)
@pytest.mark.parametrize("alpha", [0.5, 0.8, 1.0])
def test_value_matches_torch_oracle(b, k, dz, dx, alpha):
    z, x = _random_case(b * k, b, k, dz, dx)
    got = float(ndiv_loss_reference(jnp.asarray(z), jnp.asarray(x), alpha))
    want = float(ndiv_loss_torch(torch.from_numpy(z), torch.from_numpy(x), alpha))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("b,k,dz,dx", [(2, 8, 2, 16), (1, 4, 3, 5), (3, 6, 2, 8)])
def test_grad_matches_torch_oracle(b, k, dz, dx):
    z, x = _random_case(17 + b, b, k, dz, dx)
    alpha = 0.8

    gz, gx = jax.grad(
        lambda zz, xx: ndiv_loss_reference(zz, xx, alpha), argnums=(0, 1)
    )(jnp.asarray(z), jnp.asarray(x))

    tz = torch.from_numpy(z).requires_grad_(True)
    tx = torch.from_numpy(x).requires_grad_(True)
    ndiv_loss_torch(tz, tx, alpha).backward()

    np.testing.assert_allclose(np.asarray(gz), tz.grad.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), tx.grad.numpy(), rtol=1e-4, atol=1e-5)


def test_grad_finite_differences():
    # Independent check: directional finite difference on a smooth point.
    z, x = _random_case(99, 2, 6, 2, 4)
    z, x = jnp.asarray(z), jnp.asarray(x)
    f = lambda zz, xx: ndiv_loss_reference(zz, xx, 0.8)
    gz, gx = jax.grad(f, argnums=(0, 1))(z, x)
    rng = np.random.default_rng(5)
    uz = jnp.asarray(rng.normal(size=z.shape).astype(np.float32))
    ux = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    eps = 1e-3
    fd = (f(z + eps * uz, x + eps * ux) - f(z - eps * uz, x - eps * ux)) / (2 * eps)
    analytic = jnp.sum(gz * uz) + jnp.sum(gx * ux)
    np.testing.assert_allclose(float(fd), float(analytic), rtol=5e-2, atol=1e-4)


def test_scale_invariance_of_normalization():
    # Row-normalisation makes the loss invariant to a global rescale of x.
    z, x = _random_case(7, 2, 8, 2, 10)
    base = float(ndiv_loss_reference(jnp.asarray(z), jnp.asarray(x)))
    scaled = float(ndiv_loss_reference(jnp.asarray(z), jnp.asarray(x * 100.0)))
    np.testing.assert_allclose(base, scaled, rtol=1e-4)


def test_collapsed_outputs_give_max_hinge():
    # All outputs identical -> nx == 0 -> hinge = alpha * nz everywhere.
    rng = np.random.default_rng(11)
    k = 8
    z = jnp.asarray(rng.normal(size=(1, k, 2)).astype(np.float32))
    x = jnp.ones((1, k, 4), jnp.float32)
    alpha = 0.8
    got = float(ndiv_loss_reference(z, x, alpha))
    from ndivplanning_tpu.ops.ndiv import normalized_pairwise_l2

    nz = normalized_pairwise_l2(z)
    want = float(alpha * jnp.sum(nz) / (k * (k - 1)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_degenerate_all_identical_is_finite():
    z = jnp.ones((2, 4, 2))
    x = jnp.ones((2, 4, 6))
    val = ndiv_loss_reference(z, x)
    assert np.isfinite(float(val)) and float(val) == 0.0
    gz, gx = jax.grad(
        lambda zz, xx: ndiv_loss_reference(zz, xx), argnums=(0, 1)
    )(z, x)
    assert np.all(np.isfinite(np.asarray(gz)))
    assert np.all(np.isfinite(np.asarray(gx)))


def test_rejects_bad_shapes():
    with pytest.raises(ValueError):
        ndiv_loss_reference(jnp.ones((2, 1, 2)), jnp.ones((2, 1, 3)))
    with pytest.raises(ValueError):
        ndiv_loss_reference(jnp.ones((2, 4, 2)), jnp.ones((2, 5, 3)))


def test_hinge_tie_subgradient_is_zero():
    """Strict-> convention at an exact hinge tie (ADVICE round-1): with
    k=2 every row-normalised off-diagonal entry is exactly 1, so
    alpha=1.0 puts every pair exactly AT the hinge; the shared
    convention (relu' = 0 at 0) demands zero gradient — jnp.maximum
    would give 0.5 there."""
    import jax

    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(3, 2, 2)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(3, 2, 16)).astype(np.float32))

    val = float(ndiv_loss_reference(z, x, alpha=1.0))
    assert val == 0.0
    gz, gx = jax.grad(lambda a, b: ndiv_loss_reference(a, b, 1.0),
                      argnums=(0, 1))(z, x)
    np.testing.assert_array_equal(np.asarray(gz), 0.0)
    np.testing.assert_array_equal(np.asarray(gx), 0.0)

    from ndivplanning_tpu.ops.ndiv_pallas import ndiv_loss_fused

    gz2, gx2 = jax.grad(lambda a, b: ndiv_loss_fused(a, b, 1.0),
                        argnums=(0, 1))(z, x)
    np.testing.assert_array_equal(np.asarray(gz2), 0.0)
    np.testing.assert_array_equal(np.asarray(gx2), 0.0)
