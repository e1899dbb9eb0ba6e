"""Planar quadrotor dynamics: the fourth environment family.

The stress case for the scene/state env API (SURVEY.md §2 C6): unlike
the point mass / unicycle / reacher, the quadrotor is UNDERACTUATED
with second-order attitude dynamics and gravity — position is
controlled only through thrust vectoring (tilt, then thrust), so a
waypoint is reachable only via a cascaded controller, and "do nothing"
falls.  Same ``Scene``, same branchless latch/freeze discipline, same
swept-segment collision geometry; everything downstream (rollout
scorer, planner, CEM / gradient refinement, MPC, eval, serve, export)
runs over it via ``Config.env = "quadrotor"`` (envs/registry.py).

Dynamics-fidelity contract (tests/test_quadrotor.py golden tests vs the
plain NumPy twin in tests/python_env_twin.py); action = (u1, u2) rotor
thrusts, each clipped to [0, max_thrust]:

  τ  = (u2' - u1')·arm;  ω' = clip(ω + τ/I·dt, ±max_omega)
  θ' = θ + ω'·dt                       (semi-implicit, like unicycle)
  a  = (u1'+u2')/m · [-sin θ', cos θ'] + [0, -gravity]
  v' = clip(v + a·dt, ±max_speed) per component
  p' = clip(p + v'·dt, bounds); velocity zeroed where a wall clipped
  collided latches on swept segment-vs-disc intersection
  done latches inside goal_radius; a done state is frozen.

Default physics (world units, [0,1] box): hover thrust m·g = 0.5 total
(0.25 per rotor) vs max total 3.0 — 6× control authority; gains tuned
so the cascaded waypoint controller reaches across-the-box goals within
the contract horizon (prototype sweep, round 3).
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from ndivplanning_tpu.envs.pointmass import _collision
from ndivplanning_tpu.envs.types import Scene, StepInfo


@flax.struct.dataclass
class QuadrotorState:
    """Planar quadrotor state: position + velocity + attitude.

    ``pos``/``t``/``done``/``collided`` names shared with the other
    families so scoring and planning code is env-agnostic.
    """

    pos: jnp.ndarray  # [2]
    vel: jnp.ndarray  # [2]
    theta: jnp.ndarray  # f32 scalar, tilt angle (0 = level), radians
    omega: jnp.ndarray  # f32 scalar, angular rate
    t: jnp.ndarray  # int32 scalar
    done: jnp.ndarray  # f32 {0,1} latch
    collided: jnp.ndarray  # f32 {0,1} latch


@flax.struct.dataclass
class QuadrotorParams:
    """Planar quadrotor parameters (f32 scalars, pytree leaves)."""

    dt: jnp.ndarray
    mass: jnp.ndarray
    inertia: jnp.ndarray
    arm: jnp.ndarray  # rotor moment arm
    gravity: jnp.ndarray
    max_thrust: jnp.ndarray  # per rotor
    max_speed: jnp.ndarray  # per velocity component
    max_omega: jnp.ndarray
    bounds_lo: jnp.ndarray
    bounds_hi: jnp.ndarray
    goal_radius: jnp.ndarray

    @classmethod
    def create(cls, dt=0.1, mass=1.0, inertia=0.005, arm=0.1, gravity=0.5,
               max_thrust=1.5, max_speed=2.0, max_omega=8.0,
               bounds_lo=0.0, bounds_hi=1.0,
               goal_radius=0.05) -> "QuadrotorParams":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(dt=f(dt), mass=f(mass), inertia=f(inertia), arm=f(arm),
                   gravity=f(gravity), max_thrust=f(max_thrust),
                   max_speed=f(max_speed), max_omega=f(max_omega),
                   bounds_lo=f(bounds_lo), bounds_hi=f(bounds_hi),
                   goal_radius=f(goal_radius))


def reset(params: QuadrotorParams, scene: Scene) -> QuadrotorState:
    """Start level and at rest at the scene's start."""
    del params
    return QuadrotorState(
        pos=scene.start,
        vel=jnp.zeros(2, jnp.float32),
        theta=jnp.asarray(0.0, jnp.float32),
        omega=jnp.asarray(0.0, jnp.float32),
        t=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(0.0, jnp.float32),
        collided=jnp.asarray(0.0, jnp.float32),
    )


def step(params: QuadrotorParams, scene: Scene, state: QuadrotorState,
         action: jnp.ndarray) -> tuple[QuadrotorState, StepInfo]:
    """One dynamics step; ``action = (u1, u2)`` rotor thrusts.  Pure;
    batch with ``vmap``, roll with ``lax.scan``."""
    u1 = jnp.clip(action[0], 0.0, params.max_thrust)
    u2 = jnp.clip(action[1], 0.0, params.max_thrust)
    torque = (u2 - u1) * params.arm
    omega = jnp.clip(state.omega + torque / params.inertia * params.dt,
                     -params.max_omega, params.max_omega)
    theta = state.theta + omega * params.dt
    thrust = u1 + u2
    up = jnp.stack([-jnp.sin(theta), jnp.cos(theta)])
    acc = thrust / params.mass * up + jnp.stack(
        [jnp.asarray(0.0, jnp.float32), -params.gravity])
    vel = jnp.clip(state.vel + acc * params.dt,
                   -params.max_speed, params.max_speed)
    raw_pos = state.pos + vel * params.dt
    pos = jnp.clip(raw_pos, params.bounds_lo, params.bounds_hi)
    # Per-COMPONENT absorbing walls (the pointmass convention): grazing
    # the floor kills vertical velocity but lets the body keep sliding
    # laterally — an all-or-nothing zero would full-stop every floor
    # graze, and gravity makes floor contact the common case here.
    vel = jnp.where(pos == raw_pos, vel, 0.0)

    collided_now = _collision(state.pos, pos, scene)
    dist_to_goal = jnp.sqrt(jnp.sum(jnp.square(pos - scene.goal)))
    reached_now = (dist_to_goal < params.goal_radius).astype(jnp.float32)

    alive = state.done < 0.5
    live = alive.astype(jnp.float32)
    new_state = QuadrotorState(
        pos=jnp.where(alive, pos, state.pos),
        vel=jnp.where(alive, vel, state.vel),
        theta=jnp.where(alive, theta, state.theta),
        omega=jnp.where(alive, omega, state.omega),
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


def waypoint_control(params: QuadrotorParams, state: QuadrotorState,
                     target: jnp.ndarray, kp: float = 6.0, kd: float = 3.0,
                     kth: float = 20.0, kom: float = 5.0) -> jnp.ndarray:
    """Cascaded waypoint controller (the standard quadrotor stack):

    1. position PD + gravity compensation -> desired acceleration;
    2. thrust = its projection on the CURRENT body-up axis (clipped
       non-negative — rotors cannot pull);
    3. desired tilt from the acceleration direction, attitude PD ->
       torque;
    4. mix (thrust, torque) into the two rotor commands (step() clips).
    """
    a_des = (kp * (target - state.pos) - kd * state.vel
             + jnp.stack([jnp.asarray(0.0, jnp.float32), params.gravity]))
    up = jnp.stack([-jnp.sin(state.theta), jnp.cos(state.theta)])
    thrust = jnp.maximum(params.mass * jnp.sum(a_des * up), 0.0)
    theta_des = jnp.arctan2(-a_des[0], a_des[1])
    err = theta_des - state.theta
    err = jnp.arctan2(jnp.sin(err), jnp.cos(err))  # wrap to (-pi, pi]
    torque = kth * err - kom * state.omega
    half = torque / params.arm / 2.0
    # Clip to the actuator range HERE (step() would anyway): the rollout
    # scorer's control-effort term sees the controller's output, and the
    # un-clipped attitude-loop commands (|torque|/arm can be hundreds)
    # would otherwise dwarf the goal/collision terms in every score.
    return jnp.clip(jnp.stack([thrust / 2.0 - half, thrust / 2.0 + half]),
                    0.0, params.max_thrust)
