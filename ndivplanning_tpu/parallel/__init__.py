"""Parallelism: device mesh, DP + diversity-sample sharding (L8).

SURVEY.md §2 parallelism table / §5 comm backend: data-parallel batch
sharding and the NDiv-specific diversity-sample (k) sharding over a
``jax.sharding.Mesh``, with XLA collectives over ICI — no user-space comm
layer.  TP/PP/SP/EP are deliberately not built (the reference is a
single-host GAN-planning research repo with KB-MB models; the mesh-axis
hooks here are where they would slot in).
"""

from ndivplanning_tpu.parallel.mesh import make_mesh
from ndivplanning_tpu.parallel.sharded_plan import (
    make_sharded_cem,
    make_sharded_grad,
    make_sharded_plan,
)
from ndivplanning_tpu.parallel.sharded_step import (
    make_sharded_train_step,
    ndiv_loss_sharded,
    shard_state,
)

__all__ = [
    "make_mesh",
    "make_sharded_cem",
    "make_sharded_grad",
    "make_sharded_plan",
    "make_sharded_train_step",
    "ndiv_loss_sharded",
    "shard_state",
]
