"""Independent torch-CPU oracle for parity tests and the CPU baseline.

The reference repo publishes no benchmark numbers and its mount was empty
(SURVEY.md §0, §6; BASELINE.json:13 ``"published": {}``), so this module
plays two roles prescribed by SURVEY.md §4/§6:

1. **Math oracle** — an implementation of the NDiv loss and a small
   NDiv-GAN train step written independently in torch eager mode, used by
   the test suite to cross-check values and gradients of the jnp and
   Pallas paths.
2. **CPU baseline** — the stand-in for the reference's eager-PyTorch CPU
   wall-clock (BASELINE.json:5 measures the rebuild against "reference CPU
   wall-clock"); ``bench.py`` times these functions to fill the
   "reference value" column of BASELINE.md.

Deliberately torch-idiomatic (broadcast/cdist-style autograd graph, the
exact O(N^2) framework-graph shape the fused Pallas kernel replaces) and
deliberately NOT imported by the library itself.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn


def pairwise_l2_torch(a: torch.Tensor) -> torch.Tensor:
    """[..., k, d] -> [..., k, k] pairwise L2 distances (broadcast graph)."""
    diff = a.unsqueeze(-2) - a.unsqueeze(-3)  # [..., k, k, d]
    d2 = (diff * diff).sum(-1)
    # zero-safe sqrt: value and grad are 0 at 0 (matches the JAX paths)
    pos = d2 > 0
    return torch.where(pos, torch.sqrt(torch.where(pos, d2, torch.ones_like(d2))),
                       torch.zeros_like(d2))


def ndiv_loss_torch(z: torch.Tensor, x: torch.Tensor,
                    alpha: float = 0.8) -> torch.Tensor:
    """NDiv hinge loss, same semantics as ndivplanning_tpu.ops.ndiv."""
    k = z.shape[-2]
    dz = pairwise_l2_torch(z)
    dx = pairwise_l2_torch(x)

    def row_norm(d):
        r = d.sum(-1, keepdim=True)
        pos = r > 0
        return torch.where(pos, d / torch.where(pos, r, torch.ones_like(r)),
                           torch.zeros_like(d))

    nz, nx = row_norm(dz), row_norm(dx)
    hinge = torch.relu(alpha * nz - nx)
    off = ~torch.eye(k, dtype=torch.bool)
    total = hinge.masked_fill(~off, 0.0).sum()
    n_conditions = hinge.numel() // (k * k)
    return total / (n_conditions * k * (k - 1))


class MLP(nn.Module):
    """Plain MLP matching the rebuild's models/mlp.py layer shapes."""

    def __init__(self, in_dim: int, hidden: tuple[int, ...], out_dim: int):
        super().__init__()
        layers: list[nn.Module] = []
        d = in_dim
        for h in hidden:
            layers += [nn.Linear(d, h), nn.ReLU()]
            d = h
        layers.append(nn.Linear(d, out_dim))
        self.net = nn.Sequential(*layers)

    def forward(self, x):
        return self.net(x)


class TorchNDivGAN:
    """Eager-mode NDiv-GAN mirroring SURVEY.md §3.1's train loop.

    Condition -> generator(cond, z) -> trajectory; discriminator(cond, traj)
    -> logit.  Alternating D/G updates, BCE adversarial loss + lambda *
    NDiv.  Used only as the CPU wall-clock baseline & behaviour oracle.
    """

    def __init__(self, cond_dim: int, latent_dim: int, traj_dim: int,
                 hidden: tuple[int, ...] = (256, 256), alpha: float = 0.8,
                 ndiv_weight: float = 1.0, lr: float = 1e-3,
                 seed: int = 0):
        torch.manual_seed(seed)
        self.cond_dim = cond_dim
        self.latent_dim = latent_dim
        self.traj_dim = traj_dim
        self.alpha = alpha
        self.ndiv_weight = ndiv_weight
        self.gen = MLP(cond_dim + latent_dim, hidden, traj_dim)
        self.disc = MLP(cond_dim + traj_dim, hidden, 1)
        self.opt_g = torch.optim.Adam(self.gen.parameters(), lr=lr)
        self.opt_d = torch.optim.Adam(self.disc.parameters(), lr=lr)
        self.bce = nn.BCEWithLogitsLoss()

    def generate(self, cond: torch.Tensor, z: torch.Tensor) -> torch.Tensor:
        """cond: [B, cond_dim], z: [B, k, latent] -> [B, k, traj_dim]."""
        b, k, _ = z.shape
        c = cond.unsqueeze(1).expand(b, k, self.cond_dim)
        return self.gen(torch.cat([c, z], dim=-1))

    def train_step(self, cond: torch.Tensor, real: torch.Tensor,
                   k: int) -> dict[str, float]:
        b = cond.shape[0]
        z = torch.randn(b, k, self.latent_dim)
        fake = self.generate(cond, z)

        # ---- D update (fake detached) — SURVEY.md §3.1
        c_flat = cond.unsqueeze(1).expand(b, k, self.cond_dim)
        d_real = self.disc(torch.cat([cond, real], dim=-1))
        d_fake = self.disc(
            torch.cat([c_flat, fake.detach()], dim=-1).reshape(b * k, -1))
        d_loss = self.bce(d_real, torch.ones_like(d_real)) + self.bce(
            d_fake, torch.zeros_like(d_fake))
        self.opt_d.zero_grad()
        d_loss.backward()
        self.opt_d.step()

        # ---- G update (against updated D)
        d_fake_g = self.disc(
            torch.cat([c_flat, fake], dim=-1).reshape(b * k, -1))
        g_adv = self.bce(d_fake_g, torch.ones_like(d_fake_g))
        g_ndiv = ndiv_loss_torch(z, fake, self.alpha)
        g_loss = g_adv + self.ndiv_weight * g_ndiv
        self.opt_g.zero_grad()
        g_loss.backward()
        self.opt_g.step()
        return {"d_loss": float(d_loss.detach()),
                "g_adv": float(g_adv.detach()),
                "g_ndiv": float(g_ndiv.detach())}


class ConvSceneEncoder(nn.Module):
    """Conv scene encoder mirroring models/encoder.py::SceneEncoderCNN
    (3x strided conv + dense head) for the image-conditioned config
    (BASELINE.json:9)."""

    def __init__(self, in_channels: int = 3, embed_dim: int = 64,
                 features=(16, 32, 64), image_size: int = 32):
        super().__init__()
        layers: list[nn.Module] = []
        c = in_channels
        size = image_size
        for f in features:
            layers += [nn.Conv2d(c, f, 3, stride=2, padding=1), nn.ReLU()]
            c = f
            size = (size + 1) // 2
        self.conv = nn.Sequential(*layers)
        self.head = nn.Linear(c * size * size, embed_dim)

    def forward(self, images):  # [B, H, W, C] (channels-last like the JAX side)
        x = images.permute(0, 3, 1, 2)
        x = self.conv(x)
        return self.head(x.flatten(1))


class TorchImageNDivGAN(TorchNDivGAN):
    """Image-conditioned oracle: conv encoder + trajectory decoder head.

    The CPU wall-clock stand-in for the imagecond workload; shares the
    NDiv-GAN training semantics of TorchNDivGAN with the raw condition
    being an occupancy image encoded per-network.
    """

    def __init__(self, image_size: int = 32, embed_dim: int = 64,
                 latent_dim: int = 2, traj_dim: int = 64,
                 hidden=(256, 256), alpha: float = 0.8,
                 ndiv_weight: float = 1.0, lr: float = 1e-3, seed: int = 0):
        super().__init__(cond_dim=embed_dim, latent_dim=latent_dim,
                         traj_dim=traj_dim, hidden=hidden, alpha=alpha,
                         ndiv_weight=ndiv_weight, lr=lr, seed=seed)
        torch.manual_seed(seed + 1)
        self.g_encoder = ConvSceneEncoder(embed_dim=embed_dim,
                                          image_size=image_size)
        self.d_encoder = ConvSceneEncoder(embed_dim=embed_dim,
                                          image_size=image_size)
        self.opt_g.add_param_group({"params": self.g_encoder.parameters()})
        self.opt_d.add_param_group({"params": self.d_encoder.parameters()})

    def train_step_images(self, images: torch.Tensor, real: torch.Tensor,
                          k: int) -> dict[str, float]:
        b = images.shape[0]
        z = torch.randn(b, k, self.latent_dim)
        g_cond = self.g_encoder(images)
        fake = self.generate(g_cond, z)

        d_cond = self.d_encoder(images)
        c_flat = d_cond.unsqueeze(1).expand(b, k, self.cond_dim)
        d_real = self.disc(torch.cat([d_cond, real], dim=-1))
        d_fake = self.disc(
            torch.cat([c_flat, fake.detach()], dim=-1).reshape(b * k, -1))
        d_loss = self.bce(d_real, torch.ones_like(d_real)) + self.bce(
            d_fake, torch.zeros_like(d_fake))
        self.opt_d.zero_grad()
        d_loss.backward()
        self.opt_d.step()

        d_cond = self.d_encoder(images).detach()
        c_flat = d_cond.unsqueeze(1).expand(b, k, self.cond_dim)
        d_fake_g = self.disc(
            torch.cat([c_flat, fake], dim=-1).reshape(b * k, -1))
        g_adv = self.bce(d_fake_g, torch.ones_like(d_fake_g))
        g_ndiv = ndiv_loss_torch(z, fake, self.alpha)
        g_loss = g_adv + self.ndiv_weight * g_ndiv
        self.opt_g.zero_grad()
        g_loss.backward()
        self.opt_g.step()
        return {"d_loss": float(d_loss.detach()),
                "g_adv": float(g_adv.detach()),
                "g_ndiv": float(g_ndiv.detach())}


def pointmass_step_py(pos, vel, action, dt=0.1, max_speed=2.0,
                      max_accel=4.0, bounds=(0.0, 1.0)):
    """Plain-Python/torch twin of the functional env step (tests/test_env).

    Mirrors envs/pointmass.py: acceleration clamp, speed clip, absorbing
    walls.
    """
    a = torch.clamp(action, -max_accel, max_accel)
    vel = vel + a * dt
    speed = math.sqrt(float((vel * vel).sum()))
    if speed > max_speed:
        vel = vel * (max_speed / speed)
    pos = pos + vel * dt
    lo, hi = bounds
    clipped = torch.clamp(pos, lo, hi)
    # walls absorb: zero the velocity component that hit
    vel = torch.where(clipped == pos, vel, torch.zeros_like(vel))
    return clipped, vel


def segment_hits_disc_py(a, b, centre, radius) -> bool:
    """Swept segment-vs-disc check mirroring envs/pointmass.py::_collision."""
    d = b - a
    len2 = float((d * d).sum())
    t = 0.0 if len2 < 1e-12 else float(((centre - a) * d).sum()) / len2
    t = min(max(t, 0.0), 1.0)
    closest = a + t * d
    delta = centre - closest
    return float((delta * delta).sum()) < float(radius) ** 2
