"""Two-link planar arm ("reacher"): the third environment family.

Where pointmass and unicycle live directly in workspace coordinates,
the reacher's state is JOINT space (angles + velocities) and only its
end-effector lives in the unit-box workspace the rest of the framework
speaks — so it exercises the env registry (SURVEY.md §2 C6) with a
nontrivial state<->workspace map:

- ``reset`` solves closed-form two-link inverse kinematics to place the
  end-effector at ``scene.start`` (elbow-up branch), at rest.
- ``step`` integrates joint accelerations (the action), then forward
  kinematics produce the ``pos`` field every downstream consumer
  (rollout scorer, planner, CEM/grad refinement, MPC, eval) reads.
- collision is richer than the particle envs: the swept end-effector
  segment AND both arm links (base->elbow, elbow->tip) are tested
  against the scene's obstacle discs each step, reusing the same
  segment-vs-disc predicate (`pointmass._collision`).
- ``waypoint_control`` is Jacobian-transpose operational-space PD:
  ``qdd = kp * J^T (target - ee) - kd * qd`` — the generator still
  emits workspace waypoint trajectories, unchanged.

The arm is anchored at the workspace centre with link lengths 0.4 +
0.4: reach 0.8 covers the whole unit box (corner distance from centre
is sqrt(0.5) ~ 0.707), so every scene the samplers draw is kinematically
feasible.

Dynamics-fidelity contract (tests/test_reacher.py golden tests vs the
plain NumPy twin in tests/python_env_twin.py):

  qd' = clip(qd + clip(a, +-max_accel) * dt, +-max_qd)
  q'  = q + qd' * dt            (angles unwrapped, no wall clipping —
                                 the arm is mechanically bounded)
  ee  = FK(q'); collided latches on swept-ee OR either-link disc hit
  done latches inside goal_radius of the end-effector; a done state is
  frozen.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from ndivplanning_tpu.envs.pointmass import _collision
from ndivplanning_tpu.envs.types import Scene, StepInfo


@flax.struct.dataclass
class ReacherState:
    """Two-link arm state: joint coordinates plus the cached end-effector
    position.

    ``pos`` (the FK of ``q``) is stored so the env-agnostic consumers
    (rollout scoring, MPC, eval) read the same ``pos``/``t``/``done``/
    ``collided`` surface as the other families, and so the swept
    end-effector collision can use the previous tip without re-running
    FK on the frozen state.
    """

    q: jnp.ndarray  # [2] joint angles, radians (unwrapped)
    qd: jnp.ndarray  # [2] joint velocities, rad/s
    pos: jnp.ndarray  # [2] end-effector position = FK(q)
    t: jnp.ndarray  # int32 scalar
    done: jnp.ndarray  # f32 {0,1} latch
    collided: jnp.ndarray  # f32 {0,1} latch


@flax.struct.dataclass
class ReacherParams:
    """Two-link arm parameters (f32 scalars, pytree leaves)."""

    dt: jnp.ndarray
    l1: jnp.ndarray  # first link length
    l2: jnp.ndarray  # second link length
    base: jnp.ndarray  # [2] anchor position in the workspace
    max_accel: jnp.ndarray  # joint acceleration limit, rad/s^2
    max_qd: jnp.ndarray  # joint speed limit, rad/s
    goal_radius: jnp.ndarray

    @classmethod
    def create(cls, dt=0.1, l1=0.4, l2=0.4, base=(0.5, 0.5),
               max_accel=40.0, max_qd=4.0,
               goal_radius=0.05) -> "ReacherParams":
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(dt=f(dt), l1=f(l1), l2=f(l2), base=f(base),
                   max_accel=f(max_accel), max_qd=f(max_qd),
                   goal_radius=f(goal_radius))


def forward_kinematics(params: ReacherParams,
                       q: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(elbow, end-effector) workspace positions for joint angles ``q``."""
    s1, c1 = jnp.sin(q[0]), jnp.cos(q[0])
    s12, c12 = jnp.sin(q[0] + q[1]), jnp.cos(q[0] + q[1])
    elbow = params.base + params.l1 * jnp.stack([c1, s1])
    ee = elbow + params.l2 * jnp.stack([c12, s12])
    return elbow, ee


def inverse_kinematics(params: ReacherParams,
                       target: jnp.ndarray) -> jnp.ndarray:
    """Closed-form two-link IK (elbow-up branch): joint angles whose FK
    lands on ``target`` (clamped into the reachable annulus)."""
    rel = target - params.base
    # cos(q2) from the law of cosines; clamp epsilon-inside [-1, 1] so the
    # exactly-full-extension boundary stays differentiable/non-NaN.
    c2 = (jnp.sum(rel * rel) - params.l1**2 - params.l2**2) / (
        2.0 * params.l1 * params.l2)
    c2 = jnp.clip(c2, -1.0, 1.0 - 1e-7)
    q2 = jnp.arccos(c2)  # elbow-up: q2 in (0, pi]
    q1 = jnp.arctan2(rel[1], rel[0]) - jnp.arctan2(
        params.l2 * jnp.sin(q2), params.l1 + params.l2 * c2)
    return jnp.stack([q1, q2])


def reset(params: ReacherParams, scene: Scene) -> ReacherState:
    """IK-place the end-effector at the scene's start, at rest."""
    q = inverse_kinematics(params, scene.start)
    _, ee = forward_kinematics(params, q)
    return ReacherState(
        q=q,
        qd=jnp.zeros(2, jnp.float32),
        pos=ee,  # FK(q), not scene.start verbatim: state stays self-consistent
        t=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(0.0, jnp.float32),
        collided=jnp.asarray(0.0, jnp.float32),
    )


def step(params: ReacherParams, scene: Scene, state: ReacherState,
         action: jnp.ndarray) -> tuple[ReacherState, StepInfo]:
    """One dynamics step; ``action = (qdd1, qdd2)`` joint accelerations.
    Pure; batch with ``vmap``, roll with ``lax.scan``."""
    a = jnp.clip(action, -params.max_accel, params.max_accel)
    qd = jnp.clip(state.qd + a * params.dt, -params.max_qd, params.max_qd)
    q = state.q + qd * params.dt
    elbow, ee = forward_kinematics(params, q)

    # Swept end-effector segment + both link segments vs the obstacle
    # discs (the links can sweep an obstacle the tip never touches).
    collided_now = jnp.maximum(
        _collision(state.pos, ee, scene),
        jnp.maximum(_collision(params.base, elbow, scene),
                    _collision(elbow, ee, scene)))
    dist_to_goal = jnp.sqrt(jnp.sum(jnp.square(ee - scene.goal)))
    reached_now = (dist_to_goal < params.goal_radius).astype(jnp.float32)

    alive = state.done < 0.5
    live = alive.astype(jnp.float32)
    new_state = ReacherState(
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


def jacobian(params: ReacherParams, q: jnp.ndarray) -> jnp.ndarray:
    """End-effector Jacobian d(ee)/d(q), [2, 2] (analytic)."""
    s1, c1 = jnp.sin(q[0]), jnp.cos(q[0])
    s12, c12 = jnp.sin(q[0] + q[1]), jnp.cos(q[0] + q[1])
    return jnp.array([
        [-params.l1 * s1 - params.l2 * s12, -params.l2 * s12],
        [params.l1 * c1 + params.l2 * c12, params.l2 * c12],
    ])


def waypoint_control(params: ReacherParams, state: ReacherState,
                     target: jnp.ndarray, kv: float = 6.0,
                     kacc: float = 10.0, lam: float = 0.02) -> jnp.ndarray:
    """Damped-least-squares velocity-resolved waypoint tracking.

    Plain ``J^T`` PD lags badly wherever ``J J^T`` is ill-conditioned
    (measured: 15/20 straight-ramp scenes missed the goal); resolving a
    desired workspace velocity ``kv * err`` through the DLS inverse
    ``J^T (J J^T + lam I)^-1`` gives an isotropic workspace response
    while the ``lam`` damping keeps it bounded through the straight-arm
    and folded-arm singularities (0/30 misses at these defaults).  The
    2x2 solve is a static-shape op XLA folds into the step program.
    """
    err = target - state.pos
    J = jacobian(params, state.q)
    damped = J @ J.T + lam * jnp.eye(2, dtype=jnp.float32)
    qd_star = J.T @ jnp.linalg.solve(damped, kv * err)
    return kacc * (qd_star - state.qd)
