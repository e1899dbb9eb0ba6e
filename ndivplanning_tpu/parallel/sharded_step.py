"""DP + diversity-sample-sharded training (SURVEY.md §2 L8, §5).

Two cooperating mechanisms, per SURVEY.md §5's "psum inside shard_map (or
equivalently jit with NamedSharding letting SPMD insert all-reduces)":

1. :func:`make_sharded_train_step` — the production path.  The SAME
   ``train_step_impl`` program as single-chip, jitted over the mesh with
   sharding constraints: the sampled batch is sharded ``P('dp')`` on the
   condition axis and the latent draws ``P('dp', 'div')`` on (batch, k).
   XLA's SPMD partitioner lays out every matmul accordingly and inserts
   the gradient all-reduces over ICI.  Because it is the identical
   program, parity with the single-chip step is structural
   (tests/test_parallel.py checks it numerically).

2. :func:`ndiv_loss_sharded` — the explicit-collective NDiv for a
   k-sharded tensor (SURVEY.md §7 hard-parts #5): each ``div`` shard owns
   ``k_local`` samples, ``all_gather``s the full [k, d] blocks over the
   axis (k=32 x traj-dim is KBs — negligible on ICI), computes ONLY its
   own rows of the pairwise/hinge matrices, and ``psum``s the partial
   sums.  This is the collective design the fused kernel rides in a
   sharded-k deployment.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ndivplanning_tpu.data.tasks import make_task
from ndivplanning_tpu.parallel.mesh import DIV_AXIS, DP_AXIS, make_mesh
from ndivplanning_tpu.train.state import TrainState
from ndivplanning_tpu.train.step import train_step_impl
from ndivplanning_tpu.utils.config import Config


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Replicate the train state across the mesh (params are KB-MB scale;
    DP replication is the right layout — SURVEY.md §2: TP not built)."""
    replicated = NamedSharding(mesh, P())
    return jax.device_put(state, replicated)


def make_sharded_train_step(cfg: Config, mesh: Mesh | None = None,
                            chunk: int = 1):
    """Build the jitted multi-chip train step for ``cfg``.

    Returns (step_fn, mesh); ``step_fn(state) -> (state, metrics)`` with
    state replicated, batch work sharded dp x div.  ``chunk > 1`` scans
    that many steps inside one compiled program (metrics stacked
    ``[chunk]``) — the same dispatch-latency amortisation as
    ``train_chunk``, with the collectives staying inside the scan body.
    """
    if mesh is None:
        mesh = make_mesh(cfg=cfg)
    batch_sharding = NamedSharding(mesh, P(DP_AXIS))
    z_sharding = NamedSharding(mesh, P(DP_AXIS, DIV_AXIS))
    replicated = NamedSharding(mesh, P())

    def body(state: TrainState, _=None):
        task = make_task(cfg)
        rng, k_batch = jax.random.split(state.rng)
        batch = task.sample(k_batch, cfg.batch_size)
        # Shard every batch leaf on its leading (condition) axis.
        batch = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, batch_sharding),
            batch,
        )
        state = state.replace(rng=rng)
        new_state, metrics = train_step_impl(cfg, state, batch,
                                             z_sharding=z_sharding,
                                             mesh=mesh)
        new_state = jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, replicated),
            new_state,
        )
        return new_state, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState):
        # Always scan (even length 1) so metrics are uniformly [chunk].
        return jax.lax.scan(body, state, None, length=chunk)

    return step, mesh


def ndiv_loss_sharded(z: jnp.ndarray, x: jnp.ndarray, alpha: float,
                      mesh: Mesh, impl: str = "jnp") -> jnp.ndarray:
    """NDiv loss with k sharded over the ``div`` axis and batch over ``dp``.

    Semantics identical to ``ndiv_loss_reference`` on the unsharded
    arrays (tests/test_parallel.py::test_sharded_ndiv_matches_reference).

    Two shard-local compute strategies (SURVEY.md §5 comm-backend bullet
    3: "all_gather the [k_local, d] blocks ... then run the fused Pallas
    kernel on the gathered block, psum the scalar loss"):

    ``impl="jnp"``     — each shard computes ONLY its own rows of the
                         pairwise/hinge matrices in jnp (row-slice split
                         over ``div``).
    ``impl="pallas"``  — each shard runs the fused Pallas kernel
                         (``ops/ndiv_pallas.py``) on a distinct slice of
                         the gathered *conditions* (the k×k math is
                         block-diagonal per condition, so a batch split
                         is exact) and psums the hinge sum.  This is the
                         production multi-chip path: GSPMD cannot
                         partition an opaque ``pallas_call``, but inside
                         ``shard_map`` the kernel sees plain local
                         arrays.

    Both end in the same psum over (dp, div) and division by the global
    pair count, so the result equals the unsharded loss.
    """
    b, k = z.shape[0], z.shape[1]
    m = b * k * (k - 1)
    if impl == "pallas":
        return _ndiv_sharded_pallas(z, x, alpha, mesh, m)

    def local(z_loc, x_loc):
        # z_loc: [b_local, k_local, dz]; gather full k on our dp slice.
        z_full = jax.lax.all_gather(z_loc, DIV_AXIS, axis=1, tiled=True)
        x_full = jax.lax.all_gather(x_loc, DIV_AXIS, axis=1, tiled=True)

        div_idx = jax.lax.axis_index(DIV_AXIS)
        k_local = z_loc.shape[1]
        row_offset = div_idx * k_local
        rows_z = z_loc  # [bl, k_local, d] — the rows this shard owns
        rows_x = x_loc

        def row_block(rows, full):
            # [bl, k_local, k] distances from local rows to all columns.
            sq_r = jnp.sum(rows * rows, axis=-1)  # [bl, kl]
            sq_c = jnp.sum(full * full, axis=-1)  # [bl, k]
            gram = jnp.einsum("bld,bkd->blk", rows, full,
                              precision=jax.lax.Precision.HIGHEST)
            d2 = jnp.maximum(sq_r[..., :, None] + sq_c[..., None, :]
                             - 2.0 * gram, 0.0)
            # zero the self-distance entry (global col == global row)
            cols = jnp.arange(k)[None, :]
            local_rows = jnp.arange(k_local)[:, None] + row_offset
            self_mask = cols == local_rows  # [kl, k]
            d2 = jnp.where(self_mask[None], 0.0, d2)
            pos = d2 > 0.0
            d = jnp.where(pos, jnp.sqrt(jnp.where(pos, d2, 1.0)), 0.0)
            r = jnp.sum(d, axis=-1, keepdims=True)
            r_pos = r > 0.0
            n = jnp.where(r_pos, d / jnp.where(r_pos, r, 1.0), 0.0)
            return n, self_mask

        nz, self_mask = row_block(rows_z, z_full)
        nx, _ = row_block(rows_x, x_full)
        # where(slack > 0), not maximum: keep the shared strict->
        # hinge-subgradient convention (ops/ndiv.py).
        slack = alpha * nz - nx
        hinge = jnp.where(slack > 0.0, slack, 0.0)
        hinge = jnp.where(self_mask[None], 0.0, hinge)
        partial = jnp.sum(hinge)
        total = jax.lax.psum(partial, (DP_AXIS, DIV_AXIS))
        return total / m

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DP_AXIS, DIV_AXIS, None), P(DP_AXIS, DIV_AXIS, None)),
        out_specs=P(),
    )
    return fn(z, x)


def _ndiv_sharded_pallas_shardmap(local, mesh):
    # check_vma=False: pallas_call does not declare how its outputs vary
    # across mesh axes, so shard_map's replication checker cannot verify
    # the body — the trailing psum makes the output replicated by
    # construction.
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DP_AXIS, DIV_AXIS, None), P(DP_AXIS, DIV_AXIS, None)),
        out_specs=P(),
        check_vma=False,
    )


def _ndiv_sharded_pallas(z: jnp.ndarray, x: jnp.ndarray, alpha: float,
                         mesh: Mesh, m: int) -> jnp.ndarray:
    """Fused-kernel shard-local NDiv: gather k over ``div``, split the
    gathered conditions across ``div`` shards, kernel per slice, psum."""
    from ndivplanning_tpu.ops.ndiv_pallas import ndiv_loss_fused

    div = mesh.shape[DIV_AXIS]
    k = z.shape[1]

    def local(z_loc, x_loc):
        # [b_local, k_local, d] -> [b_local, k, d]: the diversity gather.
        z_full = jax.lax.all_gather(z_loc, DIV_AXIS, axis=1, tiled=True)
        x_full = jax.lax.all_gather(x_loc, DIV_AXIS, axis=1, tiled=True)

        # The k×k math is block-diagonal per condition, so dividing the
        # gathered batch across the div shards is exact (no cross-shard
        # pairs are lost).  Zero-padded conditions contribute zero hinge
        # and zero gradient (all-zero rows normalise to 0).
        bl = z_full.shape[0]
        chunk = -(-bl // div)
        pad = chunk * div - bl
        if pad:
            z_full = jnp.pad(z_full, ((0, pad), (0, 0), (0, 0)))
            x_full = jnp.pad(x_full, ((0, pad), (0, 0), (0, 0)))
        start = jax.lax.axis_index(DIV_AXIS) * chunk
        z_my = jax.lax.dynamic_slice_in_dim(z_full, start, chunk, axis=0)
        x_my = jax.lax.dynamic_slice_in_dim(x_full, start, chunk, axis=0)

        # The kernel returns mean over its local pair count; rescale to
        # the raw hinge sum (linear, so the custom VJP scales correctly).
        m_local = chunk * k * (k - 1)
        partial = ndiv_loss_fused(z_my, x_my, alpha) * m_local
        return jax.lax.psum(partial, (DP_AXIS, DIV_AXIS)) / m

    return _ndiv_sharded_pallas_shardmap(local, mesh)(z, x)
