"""Device mesh construction (SURVEY.md §5: one global mesh).

Axes: ``dp`` shards the condition batch, ``div`` shards the k diversity
samples per condition (the NDiv-specific axis, BASELINE.json:5,11).  A
v5p-8 pod-DP job is ``Mesh(8, 1)`` or ``Mesh(4, 2)``; tests use the
8-virtual-CPU-device trick (SURVEY.md §4).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from ndivplanning_tpu.utils.config import Config

DP_AXIS = "dp"
DIV_AXIS = "div"


def make_mesh(dp: int | None = None, div: int = 1,
              cfg: Config | None = None) -> Mesh:
    """Build a ``(dp, div)`` mesh from the available devices.

    With no arguments, uses all devices on the ``dp`` axis.
    """
    if cfg is not None:
        dp, div = cfg.dp_shards, cfg.div_shards
    devices = jax.devices()
    if dp is None:
        dp = len(devices) // div
    need = dp * div
    if need > len(devices):
        raise ValueError(
            f"mesh ({dp}x{div}) needs {need} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:need]).reshape(dp, div)
    return Mesh(arr, (DP_AXIS, DIV_AXIS))
