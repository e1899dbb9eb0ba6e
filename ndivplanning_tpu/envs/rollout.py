"""Rollout engine: trajectories through the env via ``lax.scan`` (C7).

The reference scores candidate trajectories with a per-candidate Python
loop over env steps (SURVEY.md §3.3 — the slow hot loop).  Here a rollout
is one ``lax.scan`` over the horizon, and candidate batching is a ``vmap``
on top, so 1k-candidate sim-in-the-loop scoring (BASELINE.json:10) is a
single compiled program with no host round-trips.

Two trajectory interpretations (the reference's exact convention is
unknown; both are supported and config-selected, SURVEY.md §2 C7):

- "actions":   tau[t] is the acceleration applied at step t.
- "waypoints": tau[t] is a position target tracked by a PD controller
               a_t = kp * (tau[t] - pos) - kd * vel  (default mode — the
               NDiv generator emits position sequences).

Score (lower is better): final goal distance + collision penalty +
control-effort cost, the conventional planning objective (SURVEY.md §2 C7
note "[I] on score details").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndivplanning_tpu.envs.types import EnvParams, EnvState, Scene


class RolloutResult(NamedTuple):
    """Outcome of rolling one trajectory through the env."""

    final_state: EnvState
    positions: jnp.ndarray  # [H, 2] visited positions
    score: jnp.ndarray  # scalar cost, lower is better
    goal_dist: jnp.ndarray  # final distance to goal
    collided: jnp.ndarray  # 1.0 if any step collided
    reached: jnp.ndarray  # 1.0 if goal reached within horizon
    control_cost: jnp.ndarray  # sum ||a_t||^2


class ScoreWeights(NamedTuple):
    """Cost weights for candidate scoring."""

    goal: float = 1.0
    collision: float = 1.0
    control: float = 0.01


def _rollout_scan(params: EnvParams, scene: Scene, tau: jnp.ndarray,
                  mode: str, weights: ScoreWeights,
                  state0: EnvState | None = None,
                  env: str = "pointmass") -> RolloutResult:
    """Roll ``tau`` through the env from ``state0`` (default: reset).

    The explicit-start form is what receding-horizon replanning uses
    (planning/mpc.py): candidates are scored from the CURRENT state, not
    from the scene's start.  ``env`` statically selects the dynamics
    family (envs/registry.py); ``params`` must match it.
    """
    from ndivplanning_tpu.envs.registry import get_env

    api = get_env(env)
    if state0 is None:
        state0 = api.reset(params, scene)

    def body(state, tau_t):
        if mode == "actions":
            a = tau_t
        elif mode == "waypoints":
            a = api.waypoint_control(params, state, tau_t)
        else:
            raise ValueError(f"unknown rollout mode {mode!r}")
        new_state, info = api.step(params, scene, state, a)
        ctrl = jnp.sum(a * a) * (1.0 - state.done)
        return new_state, (new_state.pos, ctrl)

    final_state, (positions, ctrl) = jax.lax.scan(body, state0, tau)
    goal_dist = jnp.sqrt(jnp.sum(jnp.square(final_state.pos - scene.goal)))
    control_cost = jnp.sum(ctrl)
    score = (
        weights.goal * goal_dist
        + weights.collision * final_state.collided
        + weights.control * control_cost
    )
    return RolloutResult(
        final_state=final_state,
        positions=positions,
        score=score,
        goal_dist=goal_dist,
        collided=final_state.collided,
        reached=final_state.done,
        control_cost=control_cost,
    )


@functools.partial(jax.jit, static_argnames=("mode", "weights", "env"))
def rollout(params: EnvParams, scene: Scene, tau: jnp.ndarray,
            mode: str = "waypoints",
            weights: ScoreWeights = ScoreWeights(),
            env: str = "pointmass") -> RolloutResult:
    """Roll a single trajectory ``tau: [H, 2]`` through the env."""
    return _rollout_scan(params, scene, tau, mode, weights, env=env)


def rollout_actions(params, scene, tau, weights=ScoreWeights()):
    """``tau`` as per-step accelerations."""
    return rollout(params, scene, tau, mode="actions", weights=weights)


def rollout_waypoints(params, scene, tau, weights=ScoreWeights()):
    """``tau`` as PD-tracked position waypoints."""
    return rollout(params, scene, tau, mode="waypoints", weights=weights)


@functools.partial(jax.jit, static_argnames=("mode", "weights", "env"))
def score_candidates(params: EnvParams, scene: Scene, taus: jnp.ndarray,
                     mode: str = "waypoints",
                     weights: ScoreWeights = ScoreWeights(),
                     env: str = "pointmass") -> RolloutResult:
    """Score N candidate trajectories ``taus: [N, H, 2]`` in one program.

    ``vmap`` over candidates of the ``lax.scan`` rollout — the TPU-native
    replacement for the reference's per-candidate Python loop
    (SURVEY.md §3.3, metric "rollout steps/sec" BASELINE.json:2).
    """
    return jax.vmap(
        lambda t: _rollout_scan(params, scene, t, mode, weights, env=env)
    )(taus)


def distill_actions(params: EnvParams, scene: Scene,
                    waypoints: jnp.ndarray,
                    env: str = "pointmass") -> jnp.ndarray:
    """Expert-action distillation: run the env family's own waypoint
    controller along a waypoint path and record the actions it takes.

    The bridge from waypoint-space expert data to ACTION-space training
    (``cfg.rollout_mode="actions"``): the distilled sequence is
    dynamically consistent by construction — rolling it back through the
    env in "actions" mode reproduces the waypoint-mode rollout EXACTLY
    (same controller, same dynamics, same branchless latches; pinned by
    tests/test_action_mode.py).  Matters most for the underactuated
    families, where raw waypoint paths are poor action surrogates.
    """
    from ndivplanning_tpu.envs.registry import get_env

    api = get_env(env)
    state0 = api.reset(params, scene)

    def body(state, wp):
        a = api.waypoint_control(params, state, wp)
        new_state, _ = api.step(params, scene, state, a)
        return new_state, a

    _, actions = jax.lax.scan(body, state0, waypoints)
    return actions
