"""ndivplanning_tpu — a TPU-native trajectory-generation engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``goodmattg/ndivplanning`` (reference mount was empty this session — see
SURVEY.md §0; built to the blueprint in SURVEY.md §1-§7):

- conditional NDiv-GAN (generator / discriminator + Normalized
  Diversification pairwise hinge loss, Liu et al. CVPR 2019),
- fused Pallas kernel for the O(k^2) NDiv pairwise loss (SURVEY §2 C4),
- pure-functional planning environment rolled out with ``lax.scan`` and
  batched with ``vmap`` for sim-in-the-loop candidate scoring (SURVEY §3.3),
- single-jit G+D+NDiv train step (SURVEY §3.1),
- data-parallel + diversity-sample-sharded training over a
  ``jax.sharding.Mesh`` (SURVEY §2 parallelism table).
"""

__version__ = "0.1.0"

from ndivplanning_tpu.ops.ndiv import ndiv_loss, ndiv_loss_reference
from ndivplanning_tpu.ops.pairwise import pairwise_l2

__all__ = [
    "ndiv_loss",
    "ndiv_loss_reference",
    "pairwise_l2",
    "__version__",
]
