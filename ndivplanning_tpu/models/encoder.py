"""Conv scene encoder for image-conditioned generation (SURVEY.md §2 C3).

Maps an occupancy image of the scene (obstacles rasterised onto a grid,
plus optional start/goal channels — see data/scenes.py) to a condition
embedding.  Strided convs instead of pooling; channel counts sized so the
deepest feature maps keep the MXU busy at batch 512 (BASELINE.json:9).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class SceneEncoderCNN(nn.Module):
    """Occupancy image ``[B, H, W, C]`` -> embedding ``[B, embed_dim]``."""

    embed_dim: int = 64
    features: Sequence[int] = (16, 32, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        x = image.astype(self.dtype)
        for f in self.features:
            x = nn.Conv(f, kernel_size=(3, 3), strides=(2, 2),
                        dtype=self.dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.embed_dim, dtype=self.dtype)(x)
