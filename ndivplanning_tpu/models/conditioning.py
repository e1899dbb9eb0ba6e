"""Condition encoders for the three conditioning modes (SURVEY.md §2 C1-C3).

The reference supports unconditioned (2D point-mass, BASELINE.json:7),
start/goal-conditioned (BASELINE.json:8) and image/scene-conditioned
(BASELINE.json:9) generation.  Each mode gets an encoder module mapping
the batch's raw conditions to a ``[B, C]`` embedding consumed by both G
and D (C = 0 for the unconditioned mode).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ndivplanning_tpu.models.encoder import SceneEncoderCNN


class ConditionEncoder(nn.Module):
    """Dispatching condition encoder.

    ``mode``:
      - "none":       conditions ignored; returns a ``[B, 0]`` embedding.
      - "startgoal":  conditions ``[B, 4]`` (start xy, goal xy) -> MLP embed.
      - "image":      conditions ``[B, H, W, C]`` occupancy image -> CNN embed.
    """

    mode: str
    embed_dim: int = 64
    hidden: Sequence[int] = (64,)
    encoder_features: Sequence[int] = (16, 32, 64)  # conv channels (image)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, conditions: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "none":
            b = conditions.shape[0]
            return jnp.zeros((b, 0), conditions.dtype)
        if self.mode == "startgoal":
            x = conditions.astype(self.dtype)
            for h in self.hidden:
                x = nn.relu(nn.Dense(h, dtype=self.dtype)(x))
            return nn.Dense(self.embed_dim, dtype=self.dtype)(x)
        if self.mode == "image":
            return SceneEncoderCNN(embed_dim=self.embed_dim,
                                   features=tuple(self.encoder_features),
                                   dtype=self.dtype)(conditions)
        raise ValueError(f"unknown conditioning mode {self.mode!r}")


def make_condition_encoder(mode: str, embed_dim: int = 64) -> ConditionEncoder:
    return ConditionEncoder(mode=mode, embed_dim=embed_dim)


def condition_input_example(mode: str, batch: int, image_size: int = 32,
                            image_channels: int = 3):
    """A zero example of the raw condition input for param init.

    Image conditions are 3-channel by default: occupancy + start/goal
    blobs (data/scenes.py rasteriser).
    """
    if mode == "none":
        return jnp.zeros((batch, 0), jnp.float32)
    if mode == "startgoal":
        return jnp.zeros((batch, 4), jnp.float32)
    if mode == "image":
        return jnp.zeros((batch, image_size, image_size, image_channels),
                         jnp.float32)
    raise ValueError(f"unknown conditioning mode {mode!r}")
