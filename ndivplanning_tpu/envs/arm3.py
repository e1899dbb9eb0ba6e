"""Three-link planar arm ("arm3"): the fifth environment family — and
the first whose ACTION space is not 2-D.

Every earlier family happens to have ``action_dim == 2 == state_dim``,
so nothing downstream ever had to distinguish "workspace waypoint dim"
from "action dim".  arm3 breaks that coincidence on purpose
(``action_dim == 3``): it is the live proof that the registry-derived
action dimension (``envs/registry.py::action_dim``, VERDICT r4 weak #5)
flows end-to-end — rollout's waypoint controller, action-mode rollouts,
``distill_actions`` recording, iLQR/trajopt refinement (both read ``du``
off the action sequence they are given), CEM, MPC, and expert-iteration
recording all operate at [H, 3] for this family while the generator
keeps emitting [H, 2] workspace waypoints, unchanged.

Mechanically it is the reacher's bigger sibling (SURVEY.md §2 C6; see
envs/reacher.py for the family contract prose):

- kinematically REDUNDANT: 3 joints, 2-D task space, so the waypoint
  controller's damped-least-squares inverse picks the minimum-norm
  joint velocity out of a one-parameter family of solutions.
- ``reset`` zeroes the distal joint and solves the closed-form two-link
  IK over the virtual links (l1, l2+l3) — elbow-up branch, at rest.
  Link lengths default to 0.4 + 0.2 + 0.2, making the virtual two-link
  exactly the reacher's 0.4 + 0.4: same full unit-box reachability
  (corner distance from the centre base is sqrt(0.5) ~ 0.707 < 0.8).
- collision tests ALL THREE link segments plus the swept end-effector
  segment against the scene's obstacle discs each step, reusing
  `pointmass._collision`.

Dynamics-fidelity contract (tests/test_arm3.py golden tests vs the
plain NumPy twin in tests/python_env_twin.py):

  qd' = clip(qd + clip(a, +-max_accel) * dt, +-max_qd)      (all [3])
  q'  = q + qd' * dt            (angles unwrapped, no wall clipping —
                                 the arm is mechanically bounded)
  ee  = FK(q'); collided latches on swept-ee OR any-link disc hit
  done latches inside goal_radius of the end-effector; a done state is
  frozen.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from ndivplanning_tpu.envs.pointmass import _collision
from ndivplanning_tpu.envs.types import Scene, StepInfo


@flax.struct.dataclass
class Arm3State:
    """Three-link arm state: joint coordinates plus the cached
    end-effector position (see ReacherState for why ``pos`` is stored)."""

    q: jnp.ndarray  # [3] joint angles, radians (unwrapped)
    qd: jnp.ndarray  # [3] joint velocities, rad/s
    pos: jnp.ndarray  # [2] end-effector position = FK(q)
    t: jnp.ndarray  # int32 scalar
    done: jnp.ndarray  # f32 {0,1} latch
    collided: jnp.ndarray  # f32 {0,1} latch


@flax.struct.dataclass
class Arm3Params:
    """Three-link arm parameters (f32 scalars, pytree leaves)."""

    dt: jnp.ndarray
    l1: jnp.ndarray
    l2: jnp.ndarray
    l3: jnp.ndarray
    base: jnp.ndarray  # [2] anchor position in the workspace
    max_accel: jnp.ndarray  # joint acceleration limit, rad/s^2
    max_qd: jnp.ndarray  # joint speed limit, rad/s
    goal_radius: jnp.ndarray

    @classmethod
    def create(cls, dt=0.1, l1=0.4, l2=0.2, l3=0.2, base=(0.5, 0.5),
               max_accel=40.0, max_qd=4.0,
               goal_radius=0.05) -> "Arm3Params":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(dt=f(dt), l1=f(l1), l2=f(l2), l3=f(l3), base=f(base),
                   max_accel=f(max_accel), max_qd=f(max_qd),
                   goal_radius=f(goal_radius))


def forward_kinematics(
        params: Arm3Params,
        q: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(joint1, joint2, end-effector) workspace positions for ``q``."""
    a1 = q[0]
    a2 = q[0] + q[1]
    a3 = q[0] + q[1] + q[2]
    j1 = params.base + params.l1 * jnp.stack([jnp.cos(a1), jnp.sin(a1)])
    j2 = j1 + params.l2 * jnp.stack([jnp.cos(a2), jnp.sin(a2)])
    ee = j2 + params.l3 * jnp.stack([jnp.cos(a3), jnp.sin(a3)])
    return j1, j2, ee


def inverse_kinematics(params: Arm3Params,
                       target: jnp.ndarray) -> jnp.ndarray:
    """Closed-form IK with the distal joint zeroed: q3 = 0 collapses the
    arm to a virtual two-link (l1, l2+l3), solved elbow-up exactly as
    reacher.inverse_kinematics; the redundancy is spent at reset, the
    controller's DLS inverse re-spreads it during motion."""
    lv = params.l2 + params.l3
    rel = target - params.base
    c2 = (jnp.sum(rel * rel) - params.l1**2 - lv**2) / (2.0 * params.l1 * lv)
    c2 = jnp.clip(c2, -1.0, 1.0 - 1e-7)
    q2 = jnp.arccos(c2)  # elbow-up: q2 in (0, pi]
    q1 = jnp.arctan2(rel[1], rel[0]) - jnp.arctan2(
        lv * jnp.sin(q2), params.l1 + lv * c2)
    return jnp.stack([q1, q2, jnp.zeros_like(q2)])


def reset(params: Arm3Params, scene: Scene) -> Arm3State:
    """IK-place the end-effector at the scene's start, at rest."""
    q = inverse_kinematics(params, scene.start)
    _, _, ee = forward_kinematics(params, q)
    return Arm3State(
        q=q,
        qd=jnp.zeros(3, jnp.float32),
        pos=ee,  # FK(q), not scene.start verbatim: state stays self-consistent
        t=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(0.0, jnp.float32),
        collided=jnp.asarray(0.0, jnp.float32),
    )


def step(params: Arm3Params, scene: Scene, state: Arm3State,
         action: jnp.ndarray) -> tuple[Arm3State, StepInfo]:
    """One dynamics step; ``action = (qdd1, qdd2, qdd3)`` joint
    accelerations.  Pure; batch with ``vmap``, roll with ``lax.scan``."""
    a = jnp.clip(action, -params.max_accel, params.max_accel)
    qd = jnp.clip(state.qd + a * params.dt, -params.max_qd, params.max_qd)
    q = state.q + qd * params.dt
    j1, j2, ee = forward_kinematics(params, q)

    # Swept end-effector segment + all three link segments vs the
    # obstacle discs (any link can sweep an obstacle the tip never
    # touches).
    collided_now = jnp.maximum(
        jnp.maximum(_collision(state.pos, ee, scene),
                    _collision(params.base, j1, scene)),
        jnp.maximum(_collision(j1, j2, scene),
                    _collision(j2, ee, scene)))
    dist_to_goal = jnp.sqrt(jnp.sum(jnp.square(ee - scene.goal)))
    reached_now = (dist_to_goal < params.goal_radius).astype(jnp.float32)

    alive = state.done < 0.5
    live = alive.astype(jnp.float32)
    new_state = Arm3State(
        q=jnp.where(alive, q, state.q),
        qd=jnp.where(alive, qd, state.qd),
        pos=jnp.where(alive, ee, state.pos),
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


def jacobian(params: Arm3Params, q: jnp.ndarray) -> jnp.ndarray:
    """End-effector Jacobian d(ee)/d(q), [2, 3] (analytic)."""
    a1 = q[0]
    a2 = q[0] + q[1]
    a3 = q[0] + q[1] + q[2]
    s1, c1 = jnp.sin(a1), jnp.cos(a1)
    s2, c2 = jnp.sin(a2), jnp.cos(a2)
    s3, c3 = jnp.sin(a3), jnp.cos(a3)
    # Column j = sum of the link vectors distal to joint j, rotated 90°.
    x1 = -params.l1 * s1 - params.l2 * s2 - params.l3 * s3
    x2 = -params.l2 * s2 - params.l3 * s3
    x3 = -params.l3 * s3
    y1 = params.l1 * c1 + params.l2 * c2 + params.l3 * c3
    y2 = params.l2 * c2 + params.l3 * c3
    y3 = params.l3 * c3
    return jnp.array([[x1, x2, x3], [y1, y2, y3]])


def waypoint_control(params: Arm3Params, state: Arm3State,
                     target: jnp.ndarray, kv: float = 6.0,
                     kacc: float = 10.0, lam: float = 0.02) -> jnp.ndarray:
    """Damped-least-squares velocity-resolved waypoint tracking, [3]
    actions.

    Identical scheme and gains to the reacher's (see its docstring for
    the measured J^T-PD failure this replaces): resolve a desired
    workspace velocity ``kv * err`` through ``J^T (J J^T + lam I)^-1``.
    With a [2, 3] Jacobian the DLS inverse also picks the MINIMUM-NORM
    joint velocity out of the redundant one-parameter family, so the
    free internal motion stays damped instead of winding up.  Still a
    2x2 solve — redundancy changes J's width, not the workspace-side
    normal equations."""
    err = target - state.pos
    J = jacobian(params, state.q)
    damped = J @ J.T + lam * jnp.eye(2, dtype=jnp.float32)
    qd_star = J.T @ jnp.linalg.solve(damped, kv * err)
    return kacc * (qd_star - state.qd)
