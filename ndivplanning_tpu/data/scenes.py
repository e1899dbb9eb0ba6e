"""Random scene generation + occupancy-image rasterisation (C9/C3 support).

Scenes are generated fully on-device (vmapped pure functions of a PRNG
key); the rasteriser draws the masked obstacle discs plus Gaussian start/
goal blobs into a ``[S, S, 3]`` image — the conv encoder's input for the
image-conditioned config (BASELINE.json:9).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ndivplanning_tpu.envs.types import MAX_OBSTACLES, Scene


def random_scene(key: jax.Array, n_obstacles: int = 3,
                 min_radius: float = 0.06, max_radius: float = 0.14) -> Scene:
    """One random scene: corner-ish start/goal + masked obstacle discs.

    Start is drawn in the lower-left region, goal in the upper-right, and
    obstacles in the central band so straight-line paths usually collide —
    keeping sim-in-the-loop scoring informative.
    """
    k_start, k_goal, k_obs, k_rad = jax.random.split(key, 4)
    start = jax.random.uniform(k_start, (2,), minval=0.05, maxval=0.25)
    goal = jax.random.uniform(k_goal, (2,), minval=0.75, maxval=0.95)
    centers = jax.random.uniform(k_obs, (MAX_OBSTACLES, 2), minval=0.3,
                                 maxval=0.7)
    radii = jax.random.uniform(k_rad, (MAX_OBSTACLES, 1), minval=min_radius,
                               maxval=max_radius)
    obstacles = jnp.concatenate([centers, radii], axis=-1)
    mask = (jnp.arange(MAX_OBSTACLES) < n_obstacles).astype(jnp.float32)
    return Scene(start=start, goal=goal, obstacles=obstacles,
                 obstacle_mask=mask)


@functools.partial(jax.jit, static_argnames=("size",))
def rasterize_scene(scene: Scene, size: int = 32) -> jnp.ndarray:
    """Render a scene to a ``[size, size, 3]`` image.

    Channels: 0 = obstacle occupancy (1 inside any live disc), 1 = start
    blob, 2 = goal blob (Gaussians, sigma = 1.5 px).  Image row 0 is y=0
    (index [iy, ix] maps to world (x, y) = ((ix+.5)/S, (iy+.5)/S)).
    """
    coords = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    xs = coords[None, :, None]  # [1, S, 1]
    ys = coords[:, None, None]  # [S, 1, 1]

    cx = scene.obstacles[:, 0][None, None, :]
    cy = scene.obstacles[:, 1][None, None, :]
    r = scene.obstacles[:, 2][None, None, :]
    d2 = (xs - cx) ** 2 + (ys - cy) ** 2
    inside = (d2 < r * r) & (scene.obstacle_mask[None, None, :] > 0.5)
    occupancy = jnp.any(inside, axis=-1).astype(jnp.float32)

    sigma = 1.5 / size

    def blob(p):
        d2p = (xs[..., 0] - p[0]) ** 2 + (ys[..., 0] - p[1]) ** 2
        return jnp.exp(-d2p / (2.0 * sigma * sigma))

    return jnp.stack([occupancy, blob(scene.start), blob(scene.goal)], axis=-1)


def random_scene_batch(key: jax.Array, batch: int, **kw) -> Scene:
    """Batched scenes: a Scene pytree with a leading ``[batch]`` axis."""
    keys = jax.random.split(key, batch)
    return jax.vmap(lambda k: random_scene(k, **kw))(keys)


def rasterize_batch(scenes: Scene, size: int = 32) -> jnp.ndarray:
    return jax.vmap(lambda s: rasterize_scene(s, size=size))(scenes)
