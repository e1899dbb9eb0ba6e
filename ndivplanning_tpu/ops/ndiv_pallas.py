"""Fused Pallas TPU kernel for the NDiv loss (forward + hand-derived VJP).

Replaces the O(k^2) framework graph of the reference's NDiv loss
(SURVEY.md §3.2, BASELINE.json:5 "fused Pallas kernel instead of an O(N^2)
framework graph") with one VMEM-resident pass per row-tile.

TPU-first layout
----------------
The per-condition sample count k (8 or 32 in the reference configs,
BASELINE.json:7-11) is far below the 128-lane tile width, so a kernel that
worked on one [k, k] matrix at a time would starve the MXU.  Instead we
*pack*: TB = R // kp conditions' sample blocks are stacked into one
``[R, d]`` row tile (R ~ 256, kp = k rounded up to the 8-row sublane), the
full ``[R, R]`` Gram matrix is computed with a single MXU matmul, and a
block-diagonal mask confines the math to each condition's own k x k block.
The off-block FLOPs are wasted, but they ride the MXU at speed-of-light;
what matters is that distances, row-normalisation, hinge and reduction all
happen in VMEM with no HBM round-trips.

Backward pass (hand-derived, SURVEY.md §7 hard-parts #2)
-------------------------------------------------------
With n = D / rowsum(D), hinge slack s_ij = 1[alpha*nz_ij - nx_ij > 0]*g/M:

  dL/dD_pq   = (G_pq - sum_j G_pj n_pj) / r_p        (quotient rule; G=dL/dn)
  dL/da_t    = rowsum(W)_t * a_t - (W @ a)_t,        W_tj = (gD_tj+gD_jt)/D_tj

so the backward is the same masked-Gram structure plus one MXU matmul
``W @ A`` per tensor.  Subgradient conventions (shared with the jnp
reference path, ops/ndiv.py): relu' = 0 at exactly 0, d sqrt = 0 at 0,
0/0-rows normalise to 0.

Residuals: for the default "block" variant under differentiation, the
JOINT kernel computes loss AND unit-cotangent grads in one pass, so the
residuals are the grads and the backward is a scalar multiply (the loss
is scalar, so grads scale linearly with the upstream cotangent).  The
"packed" variant and the unsupported-shape fallback keep (z, x)
residuals and recompute intermediates in a separate backward kernel.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_TILE_TARGET = 256
_MAX_KP = 1024  # above this the packed Gram would blow VMEM; fall back to jnp
_SUBLANE = 8  # float32 sublane granularity

# Block-batched variant (the default): per-block [kp, kp] Grams via a
# batched dot_general instead of one [R, R] Gram + mask.  VPU work per
# tile drops from R^2 to TB*kp*128 (lane-padded), i.e. total VPU work
# becomes independent of the row-tile size, so the tile can grow to
# amortise grid overhead.  The NDiv loss is ~half the pod-config train
# step, so this matters (benchmarks/ndiv_kernel_results.json).
# Tile-size note: 2048 rows timed ~10-25% faster in a micro-sweep but the
# BACKWARD kernel's simultaneous intermediates (two distance/normalised
# matrices + W + row sums + in/out tiles, double-buffered) hit 18.7 MB of
# scoped VMEM > the 16 MB budget and fail to compile at scale; 1024 peaks
# ~9 MB and is proven at every workload shape.  The FORWARD kernel's
# footprint is far smaller (one scalar out, no W/grad tiles), so fwd and
# bwd plan their tiles independently — fwd takes the 2048-row tile the
# backward cannot afford (round-3; each path re-packs from the raw
# (z, x) residuals, so the layouts need not agree).
# Env-overridable (read at import) for on-chip tile sweeps
# (benchmarks/ndiv_tile_sweep.py) — the defaults are the measured optima.
_BLOCK_ROW_TILE_TARGET = int(os.environ.get("NDIV_BWD_ROW_TILE", "1024"))
_BLOCK_ROW_TILE_TARGET_FWD = int(os.environ.get("NDIV_FWD_ROW_TILE",
                                                "2048"))
# Joint fwd+grad kernel under differentiation (round 3).  NDIV_JOINT=0
# restores the fwd-kernel + recompute-backward scheme — kept for
# same-session A/B measurement (benchmarks/ndiv_kernel_bench.py).
_JOINT = os.environ.get("NDIV_JOINT", "1") != "0"


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _plan(batch: int, k: int):
    """Choose (kp, tb, row_tile, grid, batch_pad) for the packed layout."""
    kp = _round_up(k, _SUBLANE)
    tb = max(1, _ROW_TILE_TARGET // kp)
    row_tile = tb * kp
    batch_pad = _round_up(batch, tb)
    grid = batch_pad // tb
    return kp, tb, row_tile, grid, batch_pad


def _pack(a: jnp.ndarray, k: int, kp: int, batch: int, batch_pad: int) -> jnp.ndarray:
    """[batch, k, d] -> zero-padded [batch_pad * kp, d] row-major blocks."""
    d = a.shape[-1]
    a = a.reshape(batch, k, d).astype(jnp.float32)
    a = jnp.pad(a, ((0, batch_pad - batch), (0, kp - k), (0, 0)))
    return a.reshape(batch_pad * kp, d)


def _masks(row_tile: int, kp: int, k: int):
    """Block-diagonal validity mask for a packed [row_tile, row_tile] tile."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (row_tile, row_tile), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (row_tile, row_tile), 1)
    same_block = (rows // kp) == (cols // kp)
    in_k = ((rows % kp) < k) & ((cols % kp) < k)
    off_diag = rows != cols
    return same_block & in_k & off_diag


def _masked_distances(a, valid):
    """Masked pairwise L2 over a packed tile: D, rowsum(D), normalised n."""
    sq = jnp.sum(a * a, axis=-1, keepdims=True)  # [R, 1]
    gram = jnp.dot(a, a.T, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # MXU
    d2 = jnp.maximum(sq + sq.T - 2.0 * gram, 0.0)
    d = jnp.where(valid, jnp.sqrt(d2), 0.0)
    r = jnp.sum(d, axis=-1, keepdims=True)  # [R, 1]
    r_pos = r > 0.0
    n = jnp.where(r_pos, d / jnp.where(r_pos, r, 1.0), 0.0)
    return d, r, n


def _fwd_kernel(z_ref, x_ref, out_ref, *, kp: int, k: int, alpha: float):
    row_tile = z_ref.shape[0]
    valid = _masks(row_tile, kp, k)
    _, _, nz = _masked_distances(z_ref[:], valid)
    _, _, nx = _masked_distances(x_ref[:], valid)
    hinge = jnp.maximum(alpha * nz - nx, 0.0)

    # Accumulate across the (sequential, hence deterministic) TPU grid
    # into one SMEM scalar — no host-side partial reduction needed.
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum(hinge)


def _bwd_kernel(z_ref, x_ref, g_ref, dz_ref, dx_ref, *, kp: int, k: int,
                alpha: float, inv_m: float):
    row_tile = z_ref.shape[0]
    valid = _masks(row_tile, kp, k)
    z = z_ref[:]
    x = x_ref[:]
    dz_mat, rz, nz = _masked_distances(z, valid)
    dx_mat, rx, nx = _masked_distances(x, valid)

    # Hinge slack: upstream cotangent g spread over the M = B*k*(k-1) pairs.
    s = jnp.where((alpha * nz - nx > 0.0) & valid, g_ref[0, 0] * inv_m, 0.0)

    def grad_wrt_points(a, d_mat, r, n, g_n):
        # dL/dD via quotient rule through the row sums.
        c = jnp.sum(g_n * n, axis=-1, keepdims=True)  # [R, 1]
        r_pos = r > 0.0
        g_d = jnp.where(
            valid & r_pos, (g_n - c) / jnp.where(r_pos, r, 1.0), 0.0
        )
        # dL/da_t = rowsum(W)_t * a_t - (W @ a)_t
        d_pos = d_mat > 0.0
        w = jnp.where(d_pos, (g_d + g_d.T) / jnp.where(d_pos, d_mat, 1.0), 0.0)
        row_w = jnp.sum(w, axis=-1, keepdims=True)  # [R, 1]
        return row_w * a - jnp.dot(w, a, preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)

    dz_ref[:] = grad_wrt_points(z, dz_mat, rz, nz, alpha * s)
    dx_ref[:] = grad_wrt_points(x, dx_mat, rx, nx, -s)


# ------------------------------------------------------- block-batched path


def _block_masks(kp: int, k: int):
    """[kp, kp] within-block validity mask (shared by every block)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (kp, kp), 1)
    return (rows < k) & (cols < k) & (rows != cols)


def _block_distances(a, valid):
    """Per-block masked pairwise L2.

    a: [TB, kp, d] -> (D [TB, kp, kp], rowsum [TB, kp, 1], n [TB, kp, kp])
    """
    sq = jnp.sum(a * a, axis=-1)  # [TB, kp]
    gram = jax.lax.dot_general(
        a, a,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),  # batched a @ a^T
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [TB, kp, kp]
    d2 = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2.0 * gram, 0.0)
    d = jnp.where(valid[None], jnp.sqrt(d2), 0.0)
    r = jnp.sum(d, axis=-1, keepdims=True)  # [TB, kp, 1]
    r_pos = r > 0.0
    n = jnp.where(r_pos, d / jnp.where(r_pos, r, 1.0), 0.0)
    return d, r, n


def _tile_masks(kb: int, kp: int, k: int):
    """Within-tile validity for a ``[kb, kb]`` Gram holding kb//kp packed
    sample-blocks: same-block, within-k, off-diagonal.  For kb == kp this
    reduces exactly to :func:`_block_masks` (one block per Gram); the
    "group" variant uses kb = g*kp so g blocks share one full-lane tile."""
    if kb == kp:
        return _block_masks(kp, k)
    return _masks(kb, kp, k)


def _fwd_kernel_block(z_ref, x_ref, out_ref, *, kp: int, k: int, tb: int,
                      alpha: float, kb: int | None = None):
    kb = kp if kb is None else kb
    valid = _tile_masks(kb, kp, k)
    z = z_ref[:].reshape(tb, kb, z_ref.shape[-1])
    x = x_ref[:].reshape(tb, kb, x_ref.shape[-1])
    _, _, nz = _block_distances(z, valid)
    _, _, nx = _block_distances(x, valid)
    hinge = jnp.maximum(alpha * nz - nx, 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum(hinge)


def _bwd_kernel_block(z_ref, x_ref, g_ref, dz_ref, dx_ref, *, kp: int,
                      k: int, tb: int, alpha: float, inv_m: float,
                      kb: int | None = None):
    kb = kp if kb is None else kb
    valid = _tile_masks(kb, kp, k)
    z = z_ref[:].reshape(tb, kb, z_ref.shape[-1])
    x = x_ref[:].reshape(tb, kb, x_ref.shape[-1])
    dz_mat, rz, nz = _block_distances(z, valid)
    dx_mat, rx, nx = _block_distances(x, valid)

    s = jnp.where((alpha * nz - nx > 0.0) & valid[None],
                  g_ref[0, 0] * inv_m, 0.0)

    def grad_wrt_points(a, d_mat, r, n, g_n):
        c = jnp.sum(g_n * n, axis=-1, keepdims=True)  # [TB, kp, 1]
        r_pos = r > 0.0
        g_d = jnp.where(valid[None] & r_pos,
                        (g_n - c) / jnp.where(r_pos, r, 1.0), 0.0)
        d_pos = d_mat > 0.0
        w = jnp.where(d_pos,
                      (g_d + jnp.swapaxes(g_d, -1, -2))
                      / jnp.where(d_pos, d_mat, 1.0), 0.0)
        row_w = jnp.sum(w, axis=-1, keepdims=True)  # [TB, kp, 1]
        wa = jax.lax.dot_general(
            w, a,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),  # batched w @ a
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TB, kp, d]
        return row_w * a - wa

    gz = grad_wrt_points(z, dz_mat, rz, nz, alpha * s)
    gx = grad_wrt_points(x, dx_mat, rx, nx, -s)
    dz_ref[:] = gz.reshape(tb * kb, z_ref.shape[-1])
    dx_ref[:] = gx.reshape(tb * kb, x_ref.shape[-1])


def _joint_kernel_block(z_ref, x_ref, out_ref, dz_ref, dx_ref, *, kp: int,
                        k: int, tb: int, alpha: float, inv_m: float,
                        kb: int | None = None):
    """Fused loss + UNIT-cotangent grads in one VMEM pass (round 3).

    Training always wants both the loss and its input grads, and the loss
    is scalar, so d(loss)/d(input) scales linearly with the upstream
    cotangent: compute grads once with cotangent 1 here, and the VJP is a
    host-side scalar multiply.  This halves the distance/normalise work
    per train step (the separate backward recomputed everything the
    forward had) and drops one kernel launch + one (z, x) re-pack.
    Eval-only forwards keep the cheap `_fwd_kernel_block`.
    """
    kb = kp if kb is None else kb
    valid = _tile_masks(kb, kp, k)
    z = z_ref[:].reshape(tb, kb, z_ref.shape[-1])
    x = x_ref[:].reshape(tb, kb, x_ref.shape[-1])
    dz_mat, rz, nz = _block_distances(z, valid)
    dx_mat, rx, nx = _block_distances(x, valid)

    hinge = jnp.maximum(alpha * nz - nx, 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += jnp.sum(hinge)

    s = jnp.where((hinge > 0.0) & valid[None], inv_m, 0.0)

    def grad_wrt_points(a, d_mat, r, n, g_n):
        c = jnp.sum(g_n * n, axis=-1, keepdims=True)
        r_pos = r > 0.0
        g_d = jnp.where(valid[None] & r_pos,
                        (g_n - c) / jnp.where(r_pos, r, 1.0), 0.0)
        d_pos = d_mat > 0.0
        w = jnp.where(d_pos,
                      (g_d + jnp.swapaxes(g_d, -1, -2))
                      / jnp.where(d_pos, d_mat, 1.0), 0.0)
        row_w = jnp.sum(w, axis=-1, keepdims=True)
        wa = jax.lax.dot_general(
            w, a,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return row_w * a - wa

    gz = grad_wrt_points(z, dz_mat, rz, nz, alpha * s)
    gx = grad_wrt_points(x, dx_mat, rx, nx, -s)
    dz_ref[:] = gz.reshape(tb * kb, z_ref.shape[-1])
    dx_ref[:] = gx.reshape(tb * kb, x_ref.shape[-1])


def _plan_block(batch: int, k: int,
                target: int = _BLOCK_ROW_TILE_TARGET):
    kp = _round_up(k, _SUBLANE)
    tb = max(1, target // kp)
    row_tile = tb * kp
    batch_pad = _round_up(batch, tb)
    grid = batch_pad // tb
    return kp, tb, row_tile, grid, batch_pad


_LANE = 128  # TPU lane width: the "group" variant's Gram tile target


def _plan_group(batch: int, k: int,
                target: int = _BLOCK_ROW_TILE_TARGET):
    """Tile plan for the GROUP-packed variant (round 4, the 'different
    decomposition' named by the round-3 tile-sweep closure).

    The block variant's per-block ``[kp, kp]`` Grams put kp on the
    128-lane axis — at the contract k=8 that is 6% lane occupancy, and
    the batched MXU matmul runs TB mostly-empty systolic passes.  Here
    ``g = 128 // kp`` consecutive sample-blocks fuse into ONE
    ``[g*kp = 128, 128]`` Gram tile: full MXU tiles and full VPU lanes,
    with the same block-diagonal mask confining the math — wasted
    element FRACTION rises from 0 to (g-1)/g, but those elements ride
    otherwise-idle lanes.  (The packed variant is the g = TB extreme:
    full lanes but R/kp x wasted MXU FLOPs; group caps the waste at g.)

    Returns (kp, kb, tb, row_tile, grid, batch_pad): ``kb = g*kp`` rows
    per fused Gram, ``tb`` fused Grams per grid step.
    """
    kp = _round_up(k, _SUBLANE)
    g = max(1, _LANE // kp)
    kb = g * kp
    tb = max(1, target // kb)
    row_tile = tb * kb
    blocks_per_tile = tb * g
    batch_pad = _round_up(batch, blocks_per_tile)
    grid = batch_pad // blocks_per_tile
    return kp, kb, tb, row_tile, grid, batch_pad


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fused_available(k: int) -> bool:
    return 2 <= k and _round_up(k, _SUBLANE) <= _MAX_KP


# Default kernel variant: "block" (per-block batched Grams), "group"
# (g = 128//kp blocks fused per full-lane Gram tile — see _plan_group),
# or "packed" (one [R, R] Gram + block-diagonal mask).  Select per-call
# with the explicit ``variant`` argument — it is a static argument, so it
# keys the jit cache correctly (a mutable global would not retrigger
# compilation).  NDIV_VARIANT overrides the default (on-chip A/B sweeps).
VARIANT = os.environ.get("NDIV_VARIANT", "block")


def _fwd_sum(z: jnp.ndarray, x: jnp.ndarray, alpha: float,
             variant: str) -> jnp.ndarray:
    """Sum of hinge terms over all conditions/pairs (division by M on host)."""
    *lead, k, dz_dim = z.shape
    dx_dim = x.shape[-1]
    batch = math.prod(lead)
    if variant == "block":
        kp, tb, row_tile, grid, batch_pad = _plan_block(
            batch, k, _BLOCK_ROW_TILE_TARGET_FWD)
        kernel = functools.partial(_fwd_kernel_block, kp=kp, k=k, tb=tb,
                                   alpha=float(alpha))
    elif variant == "group":
        kp, kb, tb, row_tile, grid, batch_pad = _plan_group(
            batch, k, _BLOCK_ROW_TILE_TARGET_FWD)
        kernel = functools.partial(_fwd_kernel_block, kp=kp, k=k, tb=tb,
                                   alpha=float(alpha), kb=kb)
    else:
        kp, tb, row_tile, grid, batch_pad = _plan(batch, k)
        kernel = functools.partial(_fwd_kernel, kp=kp, k=k,
                                   alpha=float(alpha))
    z2 = _pack(z, k, kp, batch, batch_pad)
    x2 = _pack(x, k, kp, batch, batch_pad)

    total = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((row_tile, dz_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, dx_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * grid * row_tile * row_tile * (dz_dim + dx_dim),
            bytes_accessed=4 * grid * row_tile * (dz_dim + dx_dim),
            transcendentals=2 * grid * row_tile * row_tile,
        ),
        interpret=_should_interpret(),
    )(z2, x2)
    return total[0, 0]


def _bwd_grads(z: jnp.ndarray, x: jnp.ndarray, alpha: float,
               g: jnp.ndarray, variant: str):
    *lead, k, dz_dim = z.shape
    dx_dim = x.shape[-1]
    batch = math.prod(lead)
    m = batch * k * (k - 1)
    if variant == "block":
        kp, tb, row_tile, grid, batch_pad = _plan_block(batch, k)
        kernel = functools.partial(_bwd_kernel_block, kp=kp, k=k, tb=tb,
                                   alpha=float(alpha), inv_m=1.0 / m)
    elif variant == "group":
        kp, kb, tb, row_tile, grid, batch_pad = _plan_group(batch, k)
        kernel = functools.partial(_bwd_kernel_block, kp=kp, k=k, tb=tb,
                                   alpha=float(alpha), inv_m=1.0 / m, kb=kb)
    else:
        kp, tb, row_tile, grid, batch_pad = _plan(batch, k)
        kernel = functools.partial(_bwd_kernel, kp=kp, k=k,
                                   alpha=float(alpha), inv_m=1.0 / m)
    z2 = _pack(z, k, kp, batch, batch_pad)
    x2 = _pack(x, k, kp, batch, batch_pad)
    g2 = jnp.reshape(g.astype(jnp.float32), (1, 1))

    dz2, dx2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((row_tile, dz_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, dx_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((row_tile, dz_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, dx_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch_pad * kp, dz_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch_pad * kp, dx_dim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * grid * row_tile * row_tile * (dz_dim + dx_dim),
            bytes_accessed=8 * grid * row_tile * (dz_dim + dx_dim),
            transcendentals=2 * grid * row_tile * row_tile,
        ),
        interpret=_should_interpret(),
    )(z2, x2, g2)

    def unpack(a2, d, orig_dtype):
        a = a2.reshape(batch_pad, kp, d)[:batch, :k, :]
        return a.reshape(*lead, k, d).astype(orig_dtype)

    return unpack(dz2, dz_dim, z.dtype), unpack(dx2, dx_dim, x.dtype)


def _joint_loss_and_unit_grads(z: jnp.ndarray, x: jnp.ndarray, alpha: float,
                               variant: str = "block"):
    """(loss, dloss/dz, dloss/dx) in ONE kernel pass (block/group layout).

    The grads carry unit upstream cotangent; the VJP scales them by ``g``
    outside (a scalar multiply XLA fuses into the surrounding graph).
    Uses the backward's tile plan — the joint kernel's VMEM footprint is
    the backward's plus one SMEM scalar.
    """
    *lead, k, dz_dim = z.shape
    dx_dim = x.shape[-1]
    batch = math.prod(lead)
    m = batch * k * (k - 1)
    if variant == "group":
        kp, kb, tb, row_tile, grid, batch_pad = _plan_group(batch, k)
        kernel = functools.partial(_joint_kernel_block, kp=kp, k=k, tb=tb,
                                   alpha=float(alpha), inv_m=1.0 / m, kb=kb)
    else:
        kp, tb, row_tile, grid, batch_pad = _plan_block(batch, k)
        kernel = functools.partial(_joint_kernel_block, kp=kp, k=k, tb=tb,
                                   alpha=float(alpha), inv_m=1.0 / m)
    z2 = _pack(z, k, kp, batch, batch_pad)
    x2 = _pack(x, k, kp, batch, batch_pad)

    total, dz2, dx2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((row_tile, dz_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, dx_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((row_tile, dz_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, dx_dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((batch_pad * kp, dz_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch_pad * kp, dx_dim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * grid * row_tile * row_tile * (dz_dim + dx_dim),
            bytes_accessed=8 * grid * row_tile * (dz_dim + dx_dim),
            transcendentals=2 * grid * row_tile * row_tile,
        ),
        interpret=_should_interpret(),
    )(z2, x2)

    def unpack(a2, d, orig_dtype):
        a = a2.reshape(batch_pad, kp, d)[:batch, :k, :]
        return a.reshape(*lead, k, d).astype(orig_dtype)

    return (total[0, 0] / m,
            unpack(dz2, dz_dim, z.dtype), unpack(dx2, dx_dim, x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _ndiv_loss_fused(z: jnp.ndarray, x: jnp.ndarray, alpha: float,
                     variant: str) -> jnp.ndarray:
    k = z.shape[-2]
    if not _fused_available(k):
        from ndivplanning_tpu.ops.ndiv import ndiv_loss_reference

        return ndiv_loss_reference(z, x, alpha)
    *lead, k, _ = z.shape
    batch = math.prod(lead)
    m = batch * k * (k - 1)
    return _fwd_sum(z, x, alpha, variant) / m


def _vjp_fwd(z, x, alpha, variant):
    # Under differentiation the "block" variant runs the JOINT kernel:
    # residuals are the unit-cotangent grads themselves, so the backward
    # is a scalar multiply — no second kernel pass.  "packed" (and the
    # unsupported-shape fallback) keep the recompute-in-backward scheme.
    if (_JOINT and variant in ("block", "group")
            and _fused_available(z.shape[-2])):
        loss, dz_u, dx_u = _joint_loss_and_unit_grads(z, x, alpha, variant)
        return loss, (None, None, dz_u, dx_u)
    return _ndiv_loss_fused(z, x, alpha, variant), (z, x, None, None)


def _vjp_bwd(alpha, variant, residuals, g):
    z, x, dz_u, dx_u = residuals
    if dz_u is not None:
        scale = g.astype(jnp.float32)
        return ((dz_u.astype(jnp.float32) * scale).astype(dz_u.dtype),
                (dx_u.astype(jnp.float32) * scale).astype(dx_u.dtype))
    k = z.shape[-2]
    if not _fused_available(k):
        from ndivplanning_tpu.ops.ndiv import ndiv_loss_reference

        dz, dx = jax.grad(
            lambda zz, xx: ndiv_loss_reference(zz, xx, alpha), argnums=(0, 1)
        )(z, x)
        return dz * g, dx * g
    return _bwd_grads(z, x, alpha, g, variant)


_ndiv_loss_fused.defvjp(_vjp_fwd, _vjp_bwd)


def ndiv_loss_fused(z: jnp.ndarray, x: jnp.ndarray, alpha: float = 0.8,
                    variant: str | None = None) -> jnp.ndarray:
    """NDiv hinge loss via the fused Pallas kernel.

    Args / semantics identical to :func:`ndivplanning_tpu.ops.ndiv.
    ndiv_loss_reference`; parity-tested against it (tests/test_ndiv_pallas.py).
    Falls back to the jnp path for unsupported shapes (k < 2 handled there,
    kp > _MAX_KP).  ``variant`` selects the kernel layout ("block" default
    / "group" / "packed") as a static argument, so it participates in jit
    caches.
    """
    if z.shape[:-1] != x.shape[:-1]:
        raise ValueError(
            f"z and x must agree on leading/k dims, got {z.shape} vs {x.shape}"
        )
    v = VARIANT if variant is None else variant
    if v not in ("block", "group", "packed"):
        # The dispatch chains fall through their else branch to the
        # packed layout, so a typo'd NDIV_VARIANT would silently
        # benchmark the wrong kernel.
        raise ValueError(
            f"unknown NDiv kernel variant {v!r}; "
            "choose from 'block', 'group', 'packed'")
    return _ndiv_loss_fused(z, x, alpha, v)
