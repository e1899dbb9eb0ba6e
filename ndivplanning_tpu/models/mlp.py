"""Trajectory generator and discriminator MLPs (SURVEY.md §2 C1/C2).

The reference's models are MLP G/D with optional conditioning
(BASELINE.json:5,7-9).  TPU notes: hidden widths default to 256 — a
multiple of the 128-lane MXU tile — and the k diversity samples are
flattened into the batch axis before the dense stack so every matmul is
one large ``[B*k, d] @ [d, h]`` MXU op rather than k small ones.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SNDense(nn.Module):
    """Dense layer with spectral normalisation (Miyato et al. 2018):
    ``y = x @ (W / sigma_max(W)) + b``.

    TPU-first statelessness: sigma is estimated by ``sn_iters`` power
    iterations run INSIDE the forward pass from a fixed deterministic
    start vector, instead of flax's ``nn.SpectralNorm`` which threads a
    mutable ``batch_stats`` collection through every apply — that would
    force the fused train step (and all five D call sites in it) onto
    the ``mutable=`` API and change the checkpoint schema machinery.
    Power iteration on the few-hundred-wide D matrices costs ~2*iters
    matvecs — noise against the surrounding matmuls — and a fixed start
    vector keeps the program deterministic (the bitwise-reproducibility
    contract).  ``u``/``v`` are ``stop_gradient``-ed per the paper, so
    gradients flow only through W in sigma = u^T W v.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    # 15 iterations put sigma within ~1% of truth at the 256-wide D
    # layers (measured; 5 was ~7% under).  Cost: 30 matvecs on a
    # [256, 256] — noise next to the [B*k, 256] main matmul.
    sn_iters: int = 15

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        w = kernel.astype(jnp.float32)
        u = jnp.full((in_dim,), 1.0 / jnp.sqrt(in_dim), jnp.float32)
        for _ in range(self.sn_iters):
            v = w.T @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = w @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        sigma = u @ w @ v
        w_sn = (kernel / (sigma + 1e-12)).astype(self.dtype)
        return x.astype(self.dtype) @ w_sn + bias.astype(self.dtype)


class MLPTrunk(nn.Module):
    """Dense-ReLU trunk shared by G and D.

    ``dtype`` is the computation dtype (params stay f32): bf16 rides the
    MXU natively for the pod-scale configs.  ``spectral_norm`` swaps
    every Dense for :class:`SNDense` (the D-side stabiliser; G never
    sets it).
    """

    hidden: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    spectral_norm: bool = False

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        dense = SNDense if self.spectral_norm else nn.Dense
        for h in self.hidden:
            x = nn.relu(dense(h, dtype=self.dtype)(x))
        return x


class Generator(nn.Module):
    """``G(cond_embed, z) -> trajectories``.

    Args (call):
      cond_embed: ``[B, C]`` condition embedding (C may be 0 for the
        unconditioned point-mass config).
      z: ``[B, k, zdim]`` latent draws, k diversity samples per condition.

    Returns:
      ``[B, k, horizon, state_dim]`` trajectories.  ``output`` selects the
      head activation: "linear" (default) or "sigmoid" (squashes waypoints
      into the unit scene box).
    """

    horizon: int
    state_dim: int = 2
    hidden: Sequence[int] = (256, 256)
    output: str = "linear"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond_embed: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
        b, k, _ = z.shape
        if cond_embed.shape[-1] > 0:
            c = jnp.broadcast_to(cond_embed[:, None, :],
                                 (b, k, cond_embed.shape[-1]))
            x = jnp.concatenate([c, z], axis=-1)
        else:
            x = z
        x = x.reshape(b * k, -1)  # flatten k into batch: one big MXU matmul
        x = MLPTrunk(self.hidden, dtype=self.dtype)(x)
        x = nn.Dense(self.horizon * self.state_dim, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)  # downstream NDiv/env math stays f32
        if self.output == "sigmoid":
            x = nn.sigmoid(x)
        elif self.output != "linear":
            raise ValueError(f"unknown output activation {self.output!r}")
        return x.reshape(b, k, self.horizon, self.state_dim)


class Discriminator(nn.Module):
    """``D(cond_embed, traj) -> logit`` (real/fake score).

    Accepts trajectories shaped ``[B, horizon, state_dim]`` or
    ``[B, k, horizon, state_dim]`` (k folded into batch).  Returns logits
    with the trailing singleton squeezed.
    """

    hidden: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.float32
    spectral_norm: bool = False

    @nn.compact
    def __call__(self, cond_embed: jnp.ndarray, traj: jnp.ndarray,
                 return_features: bool = False):
        """With ``return_features=True`` also returns the trunk's last
        hidden layer (``[*lead, hidden[-1]]``) — the statistics matched
        by the feature-matching G loss (Salimans et al. 2016), which
        stabilises the conv-conditioned config."""
        if traj.ndim == 4:  # [B, k, H, S] -> per-sample conditioning
            b, k = traj.shape[:2]
            flat = traj.reshape(b, k, -1)
            if cond_embed.shape[-1] > 0:
                c = jnp.broadcast_to(cond_embed[:, None, :],
                                     (b, k, cond_embed.shape[-1]))
                x = jnp.concatenate([c, flat], axis=-1)
            else:
                x = flat
            x = x.reshape(b * k, -1)
            lead = (b, k)
        else:  # [B, H, S]
            b = traj.shape[0]
            flat = traj.reshape(b, -1)
            if cond_embed.shape[-1] > 0:
                x = jnp.concatenate([cond_embed, flat], axis=-1)
            else:
                x = flat
            lead = (b,)
        x = MLPTrunk(self.hidden, dtype=self.dtype,
                     spectral_norm=self.spectral_norm)(x)
        dense = SNDense if self.spectral_norm else nn.Dense
        logit = dense(1, dtype=self.dtype)(x)
        logit = logit.astype(jnp.float32).reshape(*lead)
        if return_features:
            feats = x.astype(jnp.float32).reshape(*lead, x.shape[-1])
            return logit, feats
        return logit
