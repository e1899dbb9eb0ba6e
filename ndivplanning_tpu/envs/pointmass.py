"""Point-mass dynamics: ``reset`` / ``step`` (SURVEY.md §2 C6, §3.3).

Single-particle, double-integrator planar dynamics with wall clipping,
disc-obstacle collision latching, and goal-reach termination — written
branchless (``jnp.where`` masking everywhere) so a single compiled step
serves ``vmap`` over candidates and ``lax.scan`` over the horizon.

Dynamics-fidelity contract (tests/test_env.py golden tests vs the plain
NumPy twin in tests/python_env_twin.py):

  v' = clip_speed(v + clip(a, ±max_accel) * dt, max_speed)
  p' = clip(p + v' * dt, bounds);  velocity component zeroed where the
       wall clipped it (absorbing walls)
  collided latches when p' enters any live obstacle disc
  done latches when ||p' - goal|| < goal_radius; a done state is frozen
  (pos/vel/t stop evolving) — the scan-safe early-termination mask.
"""

from __future__ import annotations

import jax.numpy as jnp

from ndivplanning_tpu.envs.types import EnvParams, EnvState, Scene, StepInfo


def reset(params: EnvParams, scene: Scene) -> EnvState:
    """Initial state at the scene's start position, at rest."""
    del params
    return EnvState(
        pos=scene.start,
        vel=jnp.zeros_like(scene.start),
        t=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(0.0, jnp.float32),
        collided=jnp.asarray(0.0, jnp.float32),
    )


def _clip_speed(vel: jnp.ndarray, max_speed: jnp.ndarray) -> jnp.ndarray:
    speed = jnp.sqrt(jnp.sum(vel * vel))
    scale = jnp.where(speed > max_speed, max_speed / jnp.maximum(speed, 1e-12), 1.0)
    return vel * scale


def _collision(prev_pos: jnp.ndarray, pos: jnp.ndarray,
               scene: Scene) -> jnp.ndarray:
    """1.0 if the segment prev_pos->pos intersects any live obstacle disc.

    Swept (segment-vs-disc) rather than a point check: one step can move
    up to max_speed*dt = 0.2 while the smallest obstacle diameter is
    0.12, so a point check would tunnel straight through thin obstacles.
    """
    a = prev_pos[None, :]  # [1, 2]
    d = (pos - prev_pos)[None, :]
    c = scene.obstacles[:, :2]  # [MAX_OBS, 2]
    len2 = jnp.sum(d * d, axis=-1)  # [1]
    t = jnp.sum((c - a) * d, axis=-1) / jnp.maximum(len2, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)[:, None]  # [MAX_OBS, 1]
    closest = a + t * d  # [MAX_OBS, 2]
    dist2 = jnp.sum(jnp.square(c - closest), axis=-1)
    inside = dist2 < jnp.square(scene.obstacles[:, 2])
    hit = jnp.any(inside & (scene.obstacle_mask > 0.5))
    return hit.astype(jnp.float32)


def waypoint_control(params: EnvParams, state: EnvState,
                     target: jnp.ndarray, kp: float = 8.0,
                     kd: float = 2.0) -> jnp.ndarray:
    """PD waypoint tracking: ``a = kp (target - pos) - kd vel`` (the
    registry-facing form of rollout._pd_control)."""
    del params
    return kp * (target - state.pos) - kd * state.vel


def step(params: EnvParams, scene: Scene, state: EnvState,
         action: jnp.ndarray) -> tuple[EnvState, StepInfo]:
    """One dynamics step.  Pure; batch with ``vmap``, roll with ``lax.scan``."""
    a = jnp.clip(action, -params.max_accel, params.max_accel)
    vel = _clip_speed(state.vel + a * params.dt, params.max_speed)
    raw_pos = state.pos + vel * params.dt
    pos = jnp.clip(raw_pos, params.bounds_lo, params.bounds_hi)
    vel = jnp.where(pos == raw_pos, vel, 0.0)  # absorbing walls

    collided_now = _collision(state.pos, pos, scene)
    dist_to_goal = jnp.sqrt(jnp.sum(jnp.square(pos - scene.goal)))
    reached_now = (dist_to_goal < params.goal_radius).astype(jnp.float32)

    # Freeze the state once done (scan-safe early termination).  `where`
    # (not lerp-style arithmetic) so live steps are bitwise-exact.
    alive = state.done < 0.5
    live = alive.astype(jnp.float32)
    new_state = EnvState(
        pos=jnp.where(alive, pos, state.pos),
        vel=jnp.where(alive, vel, state.vel),
        t=state.t + alive.astype(jnp.int32),
        done=jnp.maximum(state.done, live * reached_now),
        collided=jnp.maximum(state.collided, live * collided_now),
    )
    info = StepInfo(
        dist_to_goal=dist_to_goal,
        collided_now=live * collided_now,
        reached_now=live * reached_now,
    )
    return new_state, info
