"""Gradient latent refinement: differentiable planning through G + env.

Second refinement mode (alongside CEM, planning/cem.py), exploiting what
the reference's eager Python loop never could: the WHOLE pipeline —
generator forward, PD control, clamped double-integrator dynamics under
``lax.scan`` — is differentiable, so candidate latents can be optimised
by Adam on a soft planning objective, entirely inside one compiled
program (autodiff through the scan; optimiser updates in-jit).

The hard score's collision term is a latched step function (zero
gradient a.e.), so refinement minimises a SOFT surrogate instead:

    J(z) = goal_dist(G(c, z)) + w_obs * penetration + w_ctrl * control

where ``penetration`` is the smooth segment-vs-disc penetration depth of
the rolled-out path (same swept-segment geometry as the hard collision
check, with a safety margin), summed over steps and live obstacles.
Selection stays HONEST: after refinement, both the original and the
refined candidates are scored with the true hard score, and the best is
picked over the union — so the returned plan can only improve on its own
prior draw (tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ndivplanning_tpu.envs.rollout import ScoreWeights, _rollout_scan
from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.planning.planner import (
    PlanResult,
    _diverse_top_m,
    decode_latents as _decode,
    score_rollouts,
)
from ndivplanning_tpu.train.state import TrainState
from ndivplanning_tpu.utils.config import Config


def _segments_penetration(scene: Scene, start: jnp.ndarray,
                          positions: jnp.ndarray,
                          margin: float) -> jnp.ndarray:
    """Smooth total penetration of the path into the scene's obstacles.

    Same swept-segment geometry as ``envs.pointmass._collision`` (closest
    point of each step segment to each disc centre), but returning the
    differentiable hinge ``relu(r + margin - dist)`` summed over steps ×
    live obstacles instead of a latched boolean.
    """
    prev = jnp.concatenate([start[None], positions[:-1]], axis=0)  # [H, 2]
    d = positions - prev  # [H, 2]
    c = scene.obstacles[:, :2]  # [M, 2]
    r = scene.obstacles[:, 2]  # [M]
    len2 = jnp.sum(d * d, axis=-1)  # [H]
    # t*: projection of each centre onto each segment, clipped to it.
    t = (jnp.einsum("mk,hk->hm", c, d) - jnp.sum(prev * d, -1)[:, None]
         ) / jnp.maximum(len2, 1e-12)[:, None]  # [H, M]
    t = jnp.clip(t, 0.0, 1.0)
    closest = prev[:, None, :] + t[..., None] * d[:, None, :]  # [H, M, 2]
    dist = jnp.sqrt(jnp.sum(jnp.square(c[None] - closest), -1) + 1e-12)
    pen = jax.nn.relu(r[None] + margin - dist)  # [H, M]
    return jnp.sum(pen * scene.obstacle_mask[None])


class SoftWeights(tuple):
    """(goal, obstacle, control, margin) for the refinement objective."""

    def __new__(cls, goal=1.0, obstacle=10.0, control=0.01, margin=0.02):
        return super().__new__(cls, (goal, obstacle, control, margin))

    goal = property(lambda s: s[0])
    obstacle = property(lambda s: s[1])
    control = property(lambda s: s[2])
    margin = property(lambda s: s[3])



def soft_cost_taus(cfg: Config, scene: Scene, taus: jnp.ndarray,
                   soft: SoftWeights) -> jnp.ndarray:
    """Mean soft cost of trajectory candidates ``taus [N, H, da]``.

    The differentiable surrogate shared by the latent refiner (this
    module) and the direct trajectory optimiser (planning/trajopt.py):
    gradient flows through the waypoint/action controller and the env
    dynamics under ``lax.scan``.
    """
    from ndivplanning_tpu.envs.registry import get_env

    params = get_env(cfg.env).make_params()

    def one(tau):
        res = _rollout_scan(params, scene, tau, cfg.rollout_mode,
                            ScoreWeights(), env=cfg.env)
        pen = _segments_penetration(scene, scene.start, res.positions,
                                    soft.margin)
        return (soft.goal * res.goal_dist + soft.obstacle * pen
                + soft.control * res.control_cost)

    return jnp.mean(jax.vmap(one)(taus))


def _soft_objective(cfg: Config, state: TrainState, scene: Scene,
                    condition: jnp.ndarray, z: jnp.ndarray,
                    soft: SoftWeights) -> jnp.ndarray:
    """Mean soft cost of the candidates decoded from ``z [N, zdim]``."""
    return soft_cost_taus(cfg, scene, _decode(cfg, state, condition, z),
                          soft)


def _grad_impl(cfg: Config, state: TrainState, scene: Scene,
               condition: jnp.ndarray, key: jax.Array, n: int,
               n_steps: int, lr: float, soft: SoftWeights,
               n_diverse: int, weights: ScoreWeights, constrain=None):
    # ``constrain``: candidate-axis mesh-layout hook, identity when
    # unsharded (see planning/cem.py and parallel/sharded_plan.py).
    cst = constrain if constrain is not None else (lambda a: a)
    z0 = cst(jax.random.normal(key, (n, cfg.latent_dim)))
    opt = optax.adam(lr)
    obj = functools.partial(_soft_objective, cfg, state, scene, condition,
                            soft=soft)

    def step(carry, _):
        z, opt_state = carry
        loss, grads = jax.value_and_grad(obj)(z)
        updates, opt_state = opt.update(grads, opt_state, z)
        return (cst(optax.apply_updates(z, updates)), opt_state), loss

    (z_ref, _), loss_curve = jax.lax.scan(step, (z0, opt.init(z0)), None,
                                          length=n_steps)

    # Honest selection: hard-score the union of prior and refined
    # candidates — the result can only improve on the prior draw.
    taus = cst(jnp.concatenate([_decode(cfg, state, condition, z0),
                                _decode(cfg, state, condition, z_ref)]))
    results = score_rollouts(cfg, scene, taus, weights)
    results = results._replace(score=cst(results.score))
    # NaN-safe selection (see cem.py): a NaN-scored refined candidate
    # must not beat the finite prior draw via argmin/top-k.
    sel_scores = jnp.where(jnp.isfinite(results.score), results.score,
                           jnp.inf)
    best = jnp.argmin(sel_scores)
    diverse_idx = _diverse_top_m(taus.reshape(2 * n, -1), sel_scores,
                                 n_diverse)
    plan = PlanResult(
        best_traj=taus[best],
        best_score=results.score[best],
        best_reached=results.reached[best],
        diverse_idx=diverse_idx,
        diverse_trajs=taus[diverse_idx],
        scores=results.score,
        taus=taus,
    )
    return plan, loss_curve


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_candidates", "n_steps", "lr", "soft", "n_diverse", "weights"))
def plan_grad(cfg: Config, state: TrainState, scene: Scene,
              condition: jnp.ndarray, key: jax.Array,
              n_candidates: int | None = None, n_steps: int | None = None,
              lr: float = 0.1, soft: SoftWeights = SoftWeights(),
              n_diverse: int = 8, weights: ScoreWeights = ScoreWeights()):
    """Gradient-refined planning for one scene.

    Returns ``(PlanResult, loss_curve)``; ``loss_curve [n_steps]`` is the
    mean soft objective per Adam step.  ``PlanResult.scores``/``taus``
    cover the ``2 * n`` union of prior + refined candidates.

    Defaults: ``n = cfg.n_candidates / 4`` (each Adam step costs a
    forward+backward rollout pass, ~3 one-shot rollout-equivalents per
    candidate) and ``n_steps = cfg.grad_refine_steps``.
    """
    n = max(cfg.n_candidates // 4, 2) if n_candidates is None else n_candidates
    steps = cfg.grad_refine_steps if n_steps is None else n_steps
    return _grad_impl(cfg, state, scene, condition, key, n, steps, lr,
                      soft, n_diverse, weights)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_candidates", "n_steps", "lr", "soft", "n_diverse", "weights"))
def plan_grad_batch(cfg: Config, state: TrainState, scenes: Scene,
                    conditions: jnp.ndarray, keys: jax.Array,
                    n_candidates: int | None = None,
                    n_steps: int | None = None, lr: float = 0.1,
                    soft: SoftWeights = SoftWeights(), n_diverse: int = 8,
                    weights: ScoreWeights = ScoreWeights()):
    """Batched :func:`plan_grad` (vmap over scenes, same program)."""
    n = max(cfg.n_candidates // 4, 2) if n_candidates is None else n_candidates
    steps = cfg.grad_refine_steps if n_steps is None else n_steps
    return jax.vmap(
        lambda sc, co, k: _grad_impl(cfg, state, sc, co, k, n, steps, lr,
                                     soft, n_diverse, weights)
    )(scenes, conditions, keys)
