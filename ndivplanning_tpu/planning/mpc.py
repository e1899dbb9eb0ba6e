"""Receding-horizon (MPC-style) closed-loop planning.

Builds on the sim-in-the-loop scorer (SURVEY.md §3.3): instead of
executing the single best open-loop trajectory, the controller replans
every ``replan_every`` steps — scoring N candidate trajectories *from the
current state* — and executes only the next slice of the winner.  Each
replan is one jitted program (generator forward + vmapped lax.scan
rollouts from the live state), so a control step costs one dispatch.

The generator proposes full-horizon trajectories from its learned
distribution; under waypoint tracking the PD controller chases the
remaining waypoints from wherever the system actually is, which is what
makes replanning meaningful (disturbances/model error shrink the gap
each cycle).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ndivplanning_tpu.envs.pointmass import reset, step
from ndivplanning_tpu.envs.rollout import ScoreWeights, _pd_control, _rollout_scan
from ndivplanning_tpu.envs.types import EnvParams, EnvState, Scene
from ndivplanning_tpu.train.state import TrainState, build_models
from ndivplanning_tpu.utils.config import Config


class MPCResult(NamedTuple):
    positions: jnp.ndarray  # [T, 2] executed closed-loop path
    final_state: EnvState
    reached: jnp.ndarray  # {0,1}
    collided: jnp.ndarray  # {0,1}
    n_replans: int


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_candidates", "weights", "offset")
)
def _replan(cfg: Config, gen_state: TrainState, scene: Scene,
            condition: jnp.ndarray, env_state: EnvState, key: jax.Array,
            n_candidates: int, weights: ScoreWeights,
            offset: int) -> jnp.ndarray:
    """One replanning cycle: best candidate's REMAINING waypoints.

    Candidates are full-horizon trajectories; at episode time ``offset``
    only their tail ``tau[offset:]`` is still ahead of us, so scoring and
    execution both use that slice (scoring the full trajectory from the
    current state while executing the tail was measurably worse —
    misaligned waypoints pull the controller backwards).  ``offset`` is
    static: one compiled program per replanning phase.
    """
    gen, _ = build_models(cfg)
    z = jax.random.normal(key, (1, n_candidates, cfg.latent_dim))
    taus = gen.apply(gen_state.g_params, condition[None], z)[0]  # [N, H, S]
    taus = taus[:, min(offset, taus.shape[1] - 1):, :]
    params = EnvParams.create()
    results = jax.vmap(
        lambda t: _rollout_scan(params, scene, t, cfg.rollout_mode, weights,
                                state0=env_state)
    )(taus)
    best = jnp.argmin(results.score)
    return taus[best]


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
    params = EnvParams.create()
    env_state = reset(params, scene)
    positions = []
    n_replans = 0
    for t0 in range(0, total_steps, replan_every):
        key, k_plan = jax.random.split(key)
        tau = _replan(cfg, gen_state, scene, condition, env_state, k_plan,
                      n_candidates, weights, offset=t0)
        n_replans += 1
        # Execute the head of the winning remaining-waypoint slice.
        for t in range(min(replan_every, total_steps - t0)):
            wp = tau[min(t, tau.shape[0] - 1)]
            if cfg.rollout_mode == "waypoints":
                a = _pd_control(env_state.pos, env_state.vel, wp)
            else:
                a = wp
            env_state, _ = step(params, scene, env_state, a)
            positions.append(env_state.pos)
    return MPCResult(
        positions=jnp.stack(positions),
        final_state=env_state,
        reached=env_state.done,
        collided=env_state.collided,
        n_replans=n_replans,
    )
