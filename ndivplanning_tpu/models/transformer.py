"""Attention-based trajectory generator — the second G family.

The reference's generator is an MLP emitting the whole trajectory from
one hidden vector (SURVEY.md §2 C1; models/mlp.py is that family).
This module adds a TPU-idiomatic alternative: the trajectory is H
waypoint TOKENS refined by pre-LN self-attention blocks, so waypoint t
can attend to the rest of the plan instead of sharing one bottleneck
vector.  Selected per-config with ``g_arch="transformer"`` (the MLP
stays the default and the presets' trained/recorded family).

TPU notes, same discipline as the MLP family:
- k diversity samples fold into the batch axis -> every matmul is one
  ``[B*k*H, D]``-shaped MXU op; attention at H=32 tokens is tiny and
  fuses into a handful of kernels under XLA (no flash-attention needed
  at this sequence length — a Pallas attention kernel would be pure
  overhead below a few hundred tokens).
- static shapes everywhere; ``dtype`` threads the bf16 compute option
  (params stay f32, the f32 cast at the head keeps NDiv/env math f32).
- conditioning enters as a per-token shift of the learned positional
  embedding (FiLM-lite): cheap, keeps every token conditioned without
  cross-attention machinery.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class _Block(nn.Module):
    """Pre-LN residual block: MHSA + 4x MLP (the standard shape)."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim,
            dtype=self.dtype)(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = nn.Dense(4 * self.dim, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        return x + h


class TrajectoryTransformer(nn.Module):
    """``G(cond_embed, z) -> [B, k, horizon, state_dim]`` — call
    signature identical to :class:`models.mlp.Generator`, so
    ``ConditionedGenerator`` swaps families with no other change.
    """

    horizon: int
    state_dim: int = 2
    dim: int = 128
    layers: int = 2
    heads: int = 4
    output: str = "linear"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond_embed: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        b, k, _ = z.shape
        if cond_embed.shape[-1] > 0:
            c = jnp.broadcast_to(cond_embed[:, None, :],
                                 (b, k, cond_embed.shape[-1]))
            ctx = jnp.concatenate([c, z], axis=-1)
        else:
            ctx = z
        ctx = ctx.reshape(b * k, -1).astype(self.dtype)
        # Learned waypoint tokens, shifted per sample by the (cond, z)
        # context: every token sees the condition from layer 0.
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.horizon, self.dim), jnp.float32)
        shift = nn.Dense(self.dim, dtype=self.dtype)(ctx)
        x = pos[None].astype(self.dtype) + shift[:, None, :]
        for _ in range(self.layers):
            x = _Block(self.dim, self.heads, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(self.state_dim, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)  # downstream NDiv/env math stays f32
        if self.output == "sigmoid":
            x = nn.sigmoid(x)
        elif self.output != "linear":
            raise ValueError(f"unknown output activation {self.output!r}")
        return x.reshape(b, k, self.horizon, self.state_dim)
