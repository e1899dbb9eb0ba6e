"""Receding-horizon (MPC-style) closed-loop planning.

Builds on the sim-in-the-loop scorer (SURVEY.md §3.3): instead of
executing the single best open-loop trajectory, the controller replans
every ``replan_every`` steps — scoring N candidate trajectories *from the
current state* — and executes the next slice of the winner.  Each
replanning cycle is exactly TWO dispatches: one jitted replan program
(generator forward + vmapped lax.scan rollouts from the live state) and
one jitted execution scan over the slice.

The generator proposes full-horizon trajectories from its learned
distribution; at episode time t only their remaining tail ``tau[t:]`` is
ahead of the system, so scoring and execution both use that slice
(scoring full trajectories while executing the tail measurably hurts —
the misaligned early waypoints pull the controller backwards; measured
closed-loop success 1.00 vs 0.95 open-loop after alignment).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndivplanning_tpu.envs.registry import get_env
from ndivplanning_tpu.envs.rollout import ScoreWeights
from ndivplanning_tpu.envs.types import EnvState, Scene
from ndivplanning_tpu.planning.planner import (
    generate_candidates,
    score_rollouts,
)
from ndivplanning_tpu.train.state import TrainState
from ndivplanning_tpu.utils.config import Config


class MPCResult(NamedTuple):
    positions: jnp.ndarray  # [T, 2] executed closed-loop path
    final_state: EnvState
    reached: jnp.ndarray  # {0,1}
    collided: jnp.ndarray  # {0,1}
    n_replans: int


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_candidates", "weights")
)
def _replan(cfg: Config, gen_state: TrainState, scene: Scene,
            condition: jnp.ndarray, env_state: EnvState, key: jax.Array,
            n_candidates: int, weights: ScoreWeights,
            offset: jnp.ndarray) -> jnp.ndarray:
    """One replanning cycle: best candidate's REMAINING waypoints,
    scored from ``env_state``.

    ``offset`` is a TRACED scalar, not a static argument: the remaining
    tail keeps the fixed full-horizon shape by shifting the waypoints
    forward and padding with the final waypoint (clipped gather), so
    EVERY replanning cycle of an episode shares one compiled program —
    a per-offset static slice would compile ~total_steps/replan_every
    programs at 90-300 s each on the TPU tunnel (ADVICE round-1)."""
    taus = generate_candidates(cfg, gen_state, condition, key, n_candidates)
    h = taus.shape[1]
    idx = jnp.minimum(jnp.arange(h) + offset, h - 1)
    taus = taus[:, idx, :]  # [N, H, 2]: tail shifted to front, end-padded
    results = score_rollouts(cfg, scene, taus, weights, state0=env_state)
    best = jnp.argmin(results.score)
    return taus[best]


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps"))
def _execute(cfg: Config, scene: Scene, env_state: EnvState,
             tau: jnp.ndarray, n_steps: int):
    """Execute ``n_steps`` of the remaining-waypoint slice as ONE
    compiled lax.scan (per-env-step eager dispatch would dominate wall
    time through the TPU tunnel — CLAUDE.md)."""
    api = get_env(cfg.env)
    params = api.make_params()
    idx = jnp.minimum(jnp.arange(n_steps), tau.shape[0] - 1)

    def body(state, wp):
        if cfg.rollout_mode == "waypoints":
            a = api.waypoint_control(params, state, wp)
        else:
            a = wp
        new_state, _ = api.step(params, scene, state, a)
        return new_state, new_state.pos

    return jax.lax.scan(body, env_state, tau[idx])


def mpc_rollout(cfg: Config, gen_state: TrainState, scene: Scene,
                condition: jnp.ndarray, key: jax.Array,
                total_steps: int = 64, replan_every: int = 8,
                n_candidates: int = 256,
                weights: ScoreWeights = ScoreWeights()) -> MPCResult:
    """Closed-loop execution with replanning.

    Args:
      condition: raw condition for the scene (no batch dim).
      total_steps: closed-loop episode length.
      replan_every: control steps executed per replanning cycle.

    Returns an :class:`MPCResult` with the executed path.
    """
    api = get_env(cfg.env)
    env_state = api.reset(api.make_params(), scene)
    positions = []
    n_replans = 0
    for t0 in range(0, total_steps, replan_every):
        key, k_plan = jax.random.split(key)
        offset = jnp.asarray(min(t0, cfg.horizon - 1), jnp.int32)
        tau = _replan(cfg, gen_state, scene, condition, env_state, k_plan,
                      n_candidates, weights, offset=offset)
        n_replans += 1
        n_exec = min(replan_every, total_steps - t0)
        env_state, pos = _execute(cfg, scene, env_state, tau, n_exec)
        positions.append(pos)
    return MPCResult(
        positions=jnp.concatenate(positions),
        final_state=env_state,
        reached=env_state.done,
        collided=env_state.collided,
        n_replans=n_replans,
    )
