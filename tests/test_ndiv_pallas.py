"""Fused Pallas NDiv kernel vs jnp reference — values AND gradients.

On the CPU test backend the kernel runs in Pallas interpreter mode
(ndiv_pallas._should_interpret), which executes the same kernel program —
masking, packing, quotient-rule VJP — without TPU hardware (SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.ops.ndiv import ndiv_loss, ndiv_loss_reference
from ndivplanning_tpu.ops.ndiv_pallas import ndiv_loss_fused


def _case(seed, b, k, dz, dx):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(b, k, dz)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(b, k, dx)).astype(np.float32)),
    )


# Shapes cover: packed multi-block tiles (k=8 -> 32 blocks/tile), k padding
# (k=5 -> kp=8), single-block tiles (k=256), batch padding (b=3 vs tb).
SHAPES = [(1, 8, 2, 64), (4, 8, 2, 64), (3, 5, 3, 7), (2, 32, 2, 64), (1, 256, 4, 8)]


@pytest.mark.parametrize("b,k,dz,dx", SHAPES)
def test_forward_parity(b, k, dz, dx):
    z, x = _case(b + k, b, k, dz, dx)
    want = float(ndiv_loss_reference(z, x, 0.8))
    got = float(ndiv_loss_fused(z, x, 0.8))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("b,k,dz,dx", [(2, 8, 2, 16), (3, 5, 3, 7), (1, 32, 2, 64)])
def test_grad_parity(b, k, dz, dx):
    z, x = _case(100 + b + k, b, k, dz, dx)
    ref_gz, ref_gx = jax.grad(
        lambda zz, xx: ndiv_loss_reference(zz, xx, 0.8), argnums=(0, 1)
    )(z, x)
    ker_gz, ker_gx = jax.grad(
        lambda zz, xx: ndiv_loss_fused(zz, xx, 0.8), argnums=(0, 1)
    )(z, x)
    np.testing.assert_allclose(np.asarray(ker_gz), np.asarray(ref_gz),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ker_gx), np.asarray(ref_gx),
                               rtol=1e-4, atol=1e-6)


def test_upstream_cotangent_scaling():
    z, x = _case(7, 2, 8, 2, 8)
    _, vjp = jax.vjp(lambda zz, xx: ndiv_loss_fused(zz, xx, 0.8), z, x)
    gz1, gx1 = vjp(jnp.float32(1.0))
    gz3, gx3 = vjp(jnp.float32(3.0))
    np.testing.assert_allclose(np.asarray(gz3), 3.0 * np.asarray(gz1),
                               rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gx3), 3.0 * np.asarray(gx1),
                               rtol=1e-4, atol=1e-8)


def test_degenerate_identical_samples_finite():
    z = jnp.ones((2, 8, 2))
    x = jnp.ones((2, 8, 4))
    assert float(ndiv_loss_fused(z, x, 0.8)) == 0.0
    gz, gx = jax.grad(
        lambda zz, xx: ndiv_loss_fused(zz, xx, 0.8), argnums=(0, 1)
    )(z, x)
    assert np.all(np.isfinite(np.asarray(gz)))
    assert np.all(np.isfinite(np.asarray(gx)))


def test_fused_rejects_mismatched_leading_dims():
    import pytest

    with pytest.raises(ValueError):
        ndiv_loss_fused(jnp.ones((2, 3, 8, 2)), jnp.ones((3, 2, 8, 4)), 0.8)


def test_front_door_impl_switch():
    z, x = _case(42, 2, 8, 2, 8)
    a = float(ndiv_loss(z, x, impl="jnp"))
    b = float(ndiv_loss(z, x, impl="pallas"))
    c = float(ndiv_loss(z, x, impl="auto"))
    np.testing.assert_allclose(a, b, rtol=1e-5)
    np.testing.assert_allclose(a, c, rtol=1e-5)


def test_both_kernel_variants_parity():
    from ndivplanning_tpu.ops import ndiv_pallas

    z, x = _case(55, 3, 8, 2, 16)
    want = float(ndiv_loss_reference(z, x, 0.8))
    ref_g = jax.grad(lambda a, b: ndiv_loss_reference(a, b, 0.8),
                     argnums=(0, 1))(z, x)
    del ndiv_pallas  # variant is an explicit static argument
    for variant in ("block", "group", "packed"):
        got = float(ndiv_loss_fused(z, x, 0.8, variant=variant))
        np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=variant)
        g = jax.grad(lambda a, b: ndiv_loss_fused(a, b, 0.8, variant=variant),
                     argnums=(0, 1))(z, x)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(ref_g[0]),
                                   rtol=1e-4, atol=1e-6, err_msg=variant)
        np.testing.assert_allclose(np.asarray(g[1]), np.asarray(ref_g[1]),
                                   rtol=1e-4, atol=1e-6, err_msg=variant)


def test_random_shape_sweep_parity():
    # Property-style sweep (SURVEY.md §4: "hypothesis-style random shapes
    # (k in 2..64, dz in 1..16)"): random shapes, values + grads vs jnp.
    rng = np.random.default_rng(1234)
    for trial in range(10):
        b = int(rng.integers(1, 7))
        k = int(rng.integers(2, 65))
        dz = int(rng.integers(1, 17))
        dx = int(rng.integers(1, 80))
        z, x = _case(trial, b, k, dz, dx)
        want = float(ndiv_loss_reference(z, x, 0.8))
        got = float(ndiv_loss_fused(z, x, 0.8))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6,
                                   err_msg=f"{(b, k, dz, dx)}")
        if trial % 3 == 0:  # grads on a subset (interpret mode is slow)
            rg = jax.grad(lambda a, c: ndiv_loss_reference(a, c, 0.8),
                          argnums=(0, 1))(z, x)
            kg = jax.grad(lambda a, c: ndiv_loss_fused(a, c, 0.8),
                          argnums=(0, 1))(z, x)
            np.testing.assert_allclose(np.asarray(kg[1]), np.asarray(rg[1]),
                                       rtol=1e-3, atol=1e-6,
                                       err_msg=f"{(b, k, dz, dx)}")


def test_jit_and_grad_compose():
    z, x = _case(9, 2, 8, 2, 8)

    @jax.jit
    def loss_and_grad(zz, xx):
        return jax.value_and_grad(lambda z2: ndiv_loss_fused(z2, xx, 0.8))(zz)

    val, g = loss_and_grad(z, x)
    assert np.isfinite(float(val))
    assert g.shape == z.shape


def test_joint_kernel_value_matches_fwd_only_and_scales_cotangent():
    # Under differentiation the block variant runs the JOINT kernel
    # (loss + unit grads in one pass); the eval-only forward runs the
    # cheap fwd kernel with its own (larger) tile plan.  The two values
    # must agree, and a non-unit upstream cotangent must scale the
    # grads linearly (the joint backward is a scalar multiply).
    z, x = _case(11, 4, 32, 2, 64)
    fwd_only = float(ndiv_loss_fused(z, x, 0.8))
    val, (gz, gx) = jax.value_and_grad(
        lambda a, b: ndiv_loss_fused(a, b, 0.8), argnums=(0, 1))(z, x)
    np.testing.assert_allclose(float(val), fwd_only, rtol=1e-6)
    gz3, gx3 = jax.grad(
        lambda a, b: 3.0 * ndiv_loss_fused(a, b, 0.8), argnums=(0, 1))(z, x)
    np.testing.assert_allclose(np.asarray(gz3), 3.0 * np.asarray(gz),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(gx3), 3.0 * np.asarray(gx),
                               rtol=1e-6, atol=1e-8)


def test_group_variant_padding_and_multitile_parity():
    """Group-packed variant (round 4): shapes that exercise (a) batch
    padding up to a whole group-tile, (b) multiple grid steps, and (c)
    sublane-padded odd k — values AND grads vs the jnp reference."""
    for seed, (b, k, dz, dx) in enumerate(
            [(3, 8, 2, 16),      # pads 3 -> blocks_per_tile
             (300, 8, 2, 16),    # multi-tile at the contract k
             (40, 32, 2, 16),    # kb = 128 with kp = 32 (g = 4)
             (9, 5, 3, 7),       # kp = 8 > k: in_k masking inside groups
             (4, 128, 2, 16)]):  # kp >= lane width: g = 1 (= block)
        z, x = _case(700 + seed, b, k, dz, dx)
        want = float(ndiv_loss_reference(z, x, 0.8))
        got = float(ndiv_loss_fused(z, x, 0.8, variant="group"))
        np.testing.assert_allclose(got, want, rtol=1e-5,
                                   err_msg=f"b={b} k={k}")
        ref_g = jax.grad(lambda a, c: ndiv_loss_reference(a, c, 0.8),
                         argnums=(0, 1))(z, x)
        g = jax.grad(lambda a, c: ndiv_loss_fused(a, c, 0.8,
                                                  variant="group"),
                     argnums=(0, 1))(z, x)
        np.testing.assert_allclose(np.asarray(g[0]), np.asarray(ref_g[0]),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"b={b} k={k}")
        np.testing.assert_allclose(np.asarray(g[1]), np.asarray(ref_g[1]),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"b={b} k={k}")


def test_unknown_variant_rejected():
    """A typo'd NDIV_VARIANT / variant= must raise, not silently fall
    through to the packed layout (round-4 review fix)."""
    z = jnp.ones((4, 4, 2))
    x = jnp.ones((4, 4, 2))
    with pytest.raises(ValueError, match="unknown NDiv kernel variant"):
        ndiv_loss_fused(z, x, variant="blcok")
