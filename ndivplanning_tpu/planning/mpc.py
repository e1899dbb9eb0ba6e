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
    # NaN-safe selection (see cem.py): argmin over NaN picks the NaN.
    scores = jnp.where(jnp.isfinite(results.score), results.score, jnp.inf)
    best = jnp.argmin(scores)
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


def _episode_fused(cfg: Config, gen_state: TrainState, scene: Scene,
                   condition: jnp.ndarray, key: jax.Array,
                   total_steps: int, replan_every: int, n_candidates: int,
                   weights: ScoreWeights) -> MPCResult:
    """One closed-loop episode as a single traced program: ``lax.scan``
    over replanning cycles, each cycle = replan (generate + score from
    the live state) + execute the next ``replan_every`` waypoints.

    Where :func:`mpc_rollout` pays 2 dispatches per cycle (right for
    interactive use, where the episode may stop early on the host), this
    is ONE dispatch per episode and — crucially — vmappable, which is
    what makes closed-loop success measurable at eval-suite scale
    (:func:`mpc_rollout_batch`)."""
    if total_steps % replan_every:
        raise ValueError(
            f"fused MPC needs total_steps % replan_every == 0 for a "
            f"uniform cycle scan, got {total_steps} % {replan_every}")
    api = get_env(cfg.env)
    params = api.make_params()
    n_cycles = total_steps // replan_every

    def cycle(carry, t0):
        env_state, key = carry
        key, k_plan = jax.random.split(key)
        taus = generate_candidates(cfg, gen_state, condition, k_plan,
                                   n_candidates)
        h = taus.shape[1]
        # Remaining-tail alignment, same traced-offset trick as _replan.
        idx = jnp.minimum(jnp.arange(h) + jnp.minimum(t0, h - 1), h - 1)
        taus = taus[:, idx, :]
        results = score_rollouts(cfg, scene, taus, weights,
                                 state0=env_state)
        # NaN candidates must not win the argmin (same guard as cem.py:
        # argmin over NaN picks the NaN); +inf drops them from selection.
        scores = jnp.where(jnp.isfinite(results.score), results.score,
                           jnp.inf)
        tau = taus[jnp.argmin(scores)]

        def exec_body(state, wp):
            if cfg.rollout_mode == "waypoints":
                a = api.waypoint_control(params, state, wp)
            else:
                a = wp
            new_state, _ = api.step(params, scene, state, a)
            return new_state, new_state.pos

        wp_idx = jnp.minimum(jnp.arange(replan_every), tau.shape[0] - 1)
        env_state, pos = jax.lax.scan(exec_body, env_state, tau[wp_idx])
        return (env_state, key), pos

    t0s = jnp.arange(n_cycles, dtype=jnp.int32) * replan_every
    (env_state, _), positions = jax.lax.scan(
        cycle, (api.reset(params, scene), key), t0s)
    return MPCResult(
        positions=positions.reshape(total_steps, -1),
        final_state=env_state,
        reached=env_state.done,
        collided=env_state.collided,
        n_replans=n_cycles,
    )


@functools.partial(jax.jit, static_argnames=(
    "cfg", "total_steps", "replan_every", "n_candidates", "weights"))
def mpc_rollout_fused(cfg: Config, gen_state: TrainState, scene: Scene,
                      condition: jnp.ndarray, key: jax.Array,
                      total_steps: int = 64, replan_every: int = 8,
                      n_candidates: int = 256,
                      weights: ScoreWeights = ScoreWeights()) -> MPCResult:
    """Single-dispatch closed-loop episode (one jitted program).

    Same semantics as :func:`mpc_rollout` up to PRNG stream layout (the
    fused scan splits keys inside the program, so the two paths draw
    different candidate sets; both are self-deterministic)."""
    return _episode_fused(cfg, gen_state, scene, condition, key,
                          total_steps, replan_every, n_candidates, weights)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "total_steps", "replan_every", "n_candidates", "weights"))
def mpc_rollout_batch(cfg: Config, gen_state: TrainState, scenes: Scene,
                      conditions: jnp.ndarray, keys: jax.Array,
                      total_steps: int = 64, replan_every: int = 8,
                      n_candidates: int = 256,
                      weights: ScoreWeights = ScoreWeights()) -> MPCResult:
    """Batched closed-loop MPC: ``vmap`` episodes over scenes, one
    compiled program, one dispatch — suite-scale closed-loop eval and the
    server's ``"mpc": true`` request path.

    Args:
      scenes: Scene pytree with leading ``[B]`` axis.
      conditions: ``[B, ...]`` raw conditions; keys: ``[B]`` PRNG keys.

    Returns an :class:`MPCResult` with a leading ``[B]`` axis on every
    array field.
    """
    res = jax.vmap(
        lambda sc, co, k: _episode_fused(cfg, gen_state, sc, co, k,
                                         total_steps, replan_every,
                                         n_candidates, weights)
    )(scenes, conditions, keys)
    # n_replans is static (same for every episode); vmap would otherwise
    # hand the caller a [B] array of identical values.
    return res._replace(n_replans=total_steps // replan_every)
