"""Scene / state / params pytrees for the planning environment.

Reconstructs the reference's "scene/state API" (BASELINE.json:5,
SURVEY.md §2 C6) as immutable pytree dataclasses so they flow through
``jit`` / ``vmap`` / ``lax.scan`` unchanged.  All fields are arrays (no
Python scalars inside the hot path) and all shapes are static: obstacles
live in a fixed-capacity ``[MAX_OBSTACLES, 3]`` buffer with a validity
mask, the jit-compatible alternative to the reference's variable-length
obstacle lists.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

MAX_OBSTACLES = 8
STATE_DIM = 2  # planar point-mass position dimension


@flax.struct.dataclass
class Scene:
    """A planning scene: start, goal, and a masked set of disc obstacles.

    Attributes:
      start: ``[2]`` start position.
      goal: ``[2]`` goal position.
      obstacles: ``[MAX_OBSTACLES, 3]`` rows of (x, y, radius).
      obstacle_mask: ``[MAX_OBSTACLES]`` 1.0 for live obstacles, 0.0 for
        padding rows.
    """

    start: jnp.ndarray
    goal: jnp.ndarray
    obstacles: jnp.ndarray
    obstacle_mask: jnp.ndarray

    @classmethod
    def create(cls, start, goal, obstacles=None) -> "Scene":
        """Build a scene from concrete values, padding the obstacle buffer."""
        start = jnp.asarray(start, jnp.float32)
        goal = jnp.asarray(goal, jnp.float32)
        # Validate eagerly: a wrong-shaped scene accepted here would only
        # blow up later inside a BATCHED program (e.g. the serving path's
        # jnp.stack over a request bucket), taking unrelated requests
        # down with it.
        if start.shape != (2,) or goal.shape != (2,):
            raise ValueError(
                f"start/goal must be 2D points, got shapes "
                f"{start.shape}/{goal.shape}")
        if obstacles is None:
            obs = jnp.zeros((MAX_OBSTACLES, 3), jnp.float32)
            mask = jnp.zeros((MAX_OBSTACLES,), jnp.float32)
        else:
            obstacles = jnp.asarray(obstacles, jnp.float32).reshape(-1, 3)
            n = obstacles.shape[0]
            if n > MAX_OBSTACLES:
                raise ValueError(f"at most {MAX_OBSTACLES} obstacles, got {n}")
            obs = jnp.zeros((MAX_OBSTACLES, 3), jnp.float32)
            obs = obs.at[:n].set(obstacles)
            mask = jnp.zeros((MAX_OBSTACLES,), jnp.float32).at[:n].set(1.0)
        return cls(start=start, goal=goal, obstacles=obs, obstacle_mask=mask)


@flax.struct.dataclass
class EnvState:
    """Environment state: a single point-mass (batch via ``vmap``).

    ``done``/``collided`` are float32 {0, 1} latches rather than bools so
    the freeze/termination logic stays pure arithmetic under ``lax.scan``
    (SURVEY.md §7 hard-parts #4).
    """

    pos: jnp.ndarray  # [2]
    vel: jnp.ndarray  # [2]
    t: jnp.ndarray  # int32 scalar, steps taken
    done: jnp.ndarray  # f32 scalar latch: reached goal
    collided: jnp.ndarray  # f32 scalar latch: ever hit an obstacle


@flax.struct.dataclass
class StepInfo:
    """Per-step diagnostics emitted by ``step``."""

    dist_to_goal: jnp.ndarray
    collided_now: jnp.ndarray
    reached_now: jnp.ndarray


@flax.struct.dataclass
class EnvParams:
    """Point-mass dynamics parameters (all f32 scalars; pytree leaves so a
    single compiled step serves any parameter setting)."""

    dt: jnp.ndarray
    max_speed: jnp.ndarray
    max_accel: jnp.ndarray
    bounds_lo: jnp.ndarray
    bounds_hi: jnp.ndarray
    goal_radius: jnp.ndarray

    @classmethod
    def create(cls, dt=0.1, max_speed=2.0, max_accel=4.0, bounds_lo=0.0,
               bounds_hi=1.0, goal_radius=0.05) -> "EnvParams":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(dt=f(dt), max_speed=f(max_speed), max_accel=f(max_accel),
                   bounds_lo=f(bounds_lo), bounds_hi=f(bounds_hi),
                   goal_radius=f(goal_radius))
