"""Unicycle (Dubins-style) dynamics: the second environment family.

Demonstrates that the scene/state env API (SURVEY.md §2 C6) is generic,
not point-mass-shaped: same ``Scene``, same branchless latch/freeze
discipline, same swept-segment collision geometry — different state
(pose + heading + forward speed) and action space (acceleration +
steering rate).  Everything downstream (rollout scorer, planner, CEM /
gradient refinement, MPC, eval) runs over it via ``Config.env =
"unicycle"`` — the env is one static dispatch in the rollout scan
(envs/registry.py).

Dynamics-fidelity contract (tests/test_unicycle.py golden tests vs the
plain NumPy twin in tests/python_env_twin.py):

  ω' = clip(action[1], ±max_steer);  θ' = θ + ω'·dt
  v' = clip(v + clip(action[0], ±max_accel)·dt, 0, max_speed)
  p' = clip(p + v'·[cos θ', sin θ']·dt, bounds); speed zeroed where a
       wall clipped (absorbing walls)
  collided latches on swept segment-vs-disc intersection
  done latches inside goal_radius; a done state is frozen.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from ndivplanning_tpu.envs.pointmass import _collision
from ndivplanning_tpu.envs.types import Scene, StepInfo


@flax.struct.dataclass
class UnicycleState:
    """Unicycle state: planar pose + scalar forward speed.

    Field names shared with the point-mass ``EnvState`` where the
    semantics match (``pos``/``t``/``done``/``collided``) so scoring and
    planning code is env-agnostic.
    """

    pos: jnp.ndarray  # [2]
    heading: jnp.ndarray  # f32 scalar, radians (unwrapped)
    speed: jnp.ndarray  # f32 scalar, forward speed >= 0
    t: jnp.ndarray  # int32 scalar
    done: jnp.ndarray  # f32 {0,1} latch
    collided: jnp.ndarray  # f32 {0,1} latch


@flax.struct.dataclass
class UnicycleParams:
    """Unicycle dynamics parameters (f32 scalars, pytree leaves)."""

    dt: jnp.ndarray
    max_speed: jnp.ndarray
    max_accel: jnp.ndarray
    max_steer: jnp.ndarray  # rad/s steering-rate limit
    bounds_lo: jnp.ndarray
    bounds_hi: jnp.ndarray
    goal_radius: jnp.ndarray

    @classmethod
    def create(cls, dt=0.1, max_speed=1.5, max_accel=4.0, max_steer=4.0,
               bounds_lo=0.0, bounds_hi=1.0,
               goal_radius=0.05) -> "UnicycleParams":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(dt=f(dt), max_speed=f(max_speed), max_accel=f(max_accel),
                   max_steer=f(max_steer), bounds_lo=f(bounds_lo),
                   bounds_hi=f(bounds_hi), goal_radius=f(goal_radius))


def reset(params: UnicycleParams, scene: Scene) -> UnicycleState:
    """Start at rest at the scene's start, facing the goal."""
    del params
    d = scene.goal - scene.start
    return UnicycleState(
        pos=scene.start,
        heading=jnp.arctan2(d[1], d[0]),
        speed=jnp.asarray(0.0, jnp.float32),
        t=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(0.0, jnp.float32),
        collided=jnp.asarray(0.0, jnp.float32),
    )


def step(params: UnicycleParams, scene: Scene, state: UnicycleState,
         action: jnp.ndarray) -> tuple[UnicycleState, StepInfo]:
    """One dynamics step; ``action = (accel, steer_rate)``.  Pure;
    batch with ``vmap``, roll with ``lax.scan``."""
    a = jnp.clip(action[0], -params.max_accel, params.max_accel)
    w = jnp.clip(action[1], -params.max_steer, params.max_steer)
    heading = state.heading + w * params.dt
    speed = jnp.clip(state.speed + a * params.dt, 0.0, params.max_speed)
    direction = jnp.stack([jnp.cos(heading), jnp.sin(heading)])
    raw_pos = state.pos + speed * direction * params.dt
    pos = jnp.clip(raw_pos, params.bounds_lo, params.bounds_hi)
    speed = jnp.where(jnp.all(pos == raw_pos), speed, 0.0)  # absorbing walls

    collided_now = _collision(state.pos, pos, scene)
    dist_to_goal = jnp.sqrt(jnp.sum(jnp.square(pos - scene.goal)))
    reached_now = (dist_to_goal < params.goal_radius).astype(jnp.float32)

    alive = state.done < 0.5
    live = alive.astype(jnp.float32)
    new_state = UnicycleState(
        pos=jnp.where(alive, pos, state.pos),
        heading=jnp.where(alive, heading, state.heading),
        speed=jnp.where(alive, speed, state.speed),
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


def waypoint_control(params: UnicycleParams, state: UnicycleState,
                     target: jnp.ndarray, kp: float = 8.0, kd: float = 2.0,
                     kh: float = 4.0) -> jnp.ndarray:
    """Waypoint-tracking controller: steer toward the target's bearing,
    accelerate on distance (PD on range, P on wrapped heading error)."""
    delta = target - state.pos
    desired = jnp.arctan2(delta[1], delta[0])
    err = desired - state.heading
    err = jnp.arctan2(jnp.sin(err), jnp.cos(err))  # wrap to (-pi, pi]
    dist = jnp.sqrt(jnp.sum(delta * delta))
    accel = kp * dist - kd * state.speed
    return jnp.stack([accel, kh * err])
