"""Direct trajectory optimisation: Adam on tau itself through the env.

Third refinement mode (alongside latent CEM, planning/cem.py, and latent
gradient refinement, planning/grad_refine.py).  Where those two search
INSIDE the generator's output manifold, this one uses G only as a warm
start and then optimises the trajectory parameters directly — classic
differentiable trajectory optimisation, made cheap by the same property
the latent refiner exploits: the controller + dynamics rollout under
``lax.scan`` is differentiable end-to-end, so the whole optimisation
(init draw -> decode -> Adam on tau -> hard-score union selection) is
ONE compiled program.

Why it earns its place: a trained G emits trajectories like the ones it
saw — for hard dynamics (the underactuated quadrotor family, whose
one-shot waypoint plans are rarely dynamically consistent: open-loop
success 0.30 vs MPC's 1.00, BASELINE.md) the reachable quality inside
G's manifold is capped.  Direct tau optimisation escapes the manifold
while the honest union selection (identical to grad_refine's) guarantees
the result never falls below the prior one-shot draw.

In waypoint mode the decision variables are the PD/cascade controller's
position targets; in action mode (``cfg.rollout_mode="actions"``) they
are the raw actions — both flow gradients, both stay branchless.

Locality caveat (measured while building the escape test): first-order
optimisation slides paths AROUND obstacles but cannot jump penetration
barriers — a warm start threading the wrong side of a wall stays there.
Basin coverage is the warm start's job: n diverse G draws give n basins
and the union selection keeps the best.  For global search in tight
scenes use CEM (planning/cem.py); for hard-dynamics one-shot quality
this planner is the lever (the quadrotor study, BASELINE.md round 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ndivplanning_tpu.envs.rollout import ScoreWeights
from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.planning.grad_refine import (
    SoftWeights,
    soft_cost_taus,
)
from ndivplanning_tpu.planning.planner import (
    PlanResult,
    _diverse_top_m,
    decode_latents as _decode,
    score_rollouts,
)
from ndivplanning_tpu.train.state import TrainState
from ndivplanning_tpu.utils.config import Config


def resolve_budget(cfg: Config, n_candidates: int | None = None,
                   n_steps: int | None = None, lr: float | None = None):
    """(n_warm_starts, adam_steps, lr) with config defaults filled in —
    the ONE place the trajopt budget is resolved.  plan_trajopt[_batch],
    make_sharded_trajopt, and export_trajopt_planner all call this, so
    the live, sharded, and exported planners cannot drift apart when the
    default budget changes (it already changed once, in r3j)."""
    n = max(cfg.n_candidates // 4, 2) if n_candidates is None else n_candidates
    steps = cfg.trajopt_steps if n_steps is None else n_steps
    return n, steps, (cfg.trajopt_lr if lr is None else lr)


def _trajopt_core(cfg: Config, scene: Scene, tau0: jnp.ndarray,
                  n_steps: int, lr: float, soft: SoftWeights,
                  n_diverse: int, weights: ScoreWeights, constrain=None):
    """Adam-on-tau refinement + honest union selection, from EXPLICIT
    warm starts ``tau0 [n, H, S]`` — shared by the G-warm-started
    planner (:func:`plan_trajopt`) and the CEM->trajopt hybrid
    (:func:`plan_cem_trajopt`, which seeds from CEM's refined
    population instead of raw G draws)."""
    # ``constrain``: candidate-axis mesh-layout hook, identity when
    # unsharded (same contract as cem.py / grad_refine.py).
    cst = constrain if constrain is not None else (lambda a: a)
    n = tau0.shape[0]
    opt = optax.adam(lr)

    def step(carry, _):
        tau, opt_state = carry
        loss, grads = jax.value_and_grad(
            lambda t: soft_cost_taus(cfg, scene, t, soft))(tau)
        updates, opt_state = opt.update(grads, opt_state, tau)
        return (cst(optax.apply_updates(tau, updates)), opt_state), loss

    (tau_ref, _), loss_curve = jax.lax.scan(
        step, (tau0, opt.init(tau0)), None, length=n_steps)

    # Honest selection over the union of warm start and optimised taus:
    # the returned plan can only improve on its own prior draw (tested).
    taus = cst(jnp.concatenate([tau0, tau_ref]))
    results = score_rollouts(cfg, scene, taus, weights)
    results = results._replace(score=cst(results.score))
    sel_scores = jnp.where(jnp.isfinite(results.score), results.score,
                           jnp.inf)  # NaN-safe, as in cem.py
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


def _trajopt_impl(cfg: Config, state: TrainState, scene: Scene,
                  condition: jnp.ndarray, key: jax.Array, n: int,
                  n_steps: int, lr: float, soft: SoftWeights,
                  n_diverse: int, weights: ScoreWeights, constrain=None):
    cst = constrain if constrain is not None else (lambda a: a)
    z0 = cst(jax.random.normal(key, (n, cfg.latent_dim)))
    tau0 = cst(_decode(cfg, state, condition, z0))  # G as warm start
    return _trajopt_core(cfg, scene, tau0, n_steps, lr, soft, n_diverse,
                         weights, constrain=constrain)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_candidates", "n_steps", "lr", "soft", "n_diverse", "weights"))
def plan_trajopt(cfg: Config, state: TrainState, scene: Scene,
                 condition: jnp.ndarray, key: jax.Array,
                 n_candidates: int | None = None,
                 n_steps: int | None = None, lr: float | None = None,
                 soft: SoftWeights = SoftWeights(), n_diverse: int = 8,
                 weights: ScoreWeights = ScoreWeights()):
    """Direct trajectory optimisation for one scene.

    Returns ``(PlanResult, loss_curve)``; ``loss_curve [n_steps]`` is the
    mean soft objective per Adam step.  Defaults mirror
    :func:`~ndivplanning_tpu.planning.grad_refine.plan_grad` (same
    per-step cost structure: each Adam step is one fwd+bwd rollout pass
    per candidate); the Adam budget defaults to the measured-best
    ``cfg.trajopt_steps`` / ``cfg.trajopt_lr`` (BASELINE.md r3j).
    """
    n, steps, lr = resolve_budget(cfg, n_candidates, n_steps, lr)
    return _trajopt_impl(cfg, state, scene, condition, key, n, steps, lr,
                         soft, n_diverse, weights)


def _cem_trajopt_impl(cfg: Config, state: TrainState, scene: Scene,
                      condition: jnp.ndarray, key: jax.Array,
                      n_steps: int, lr: float, soft: SoftWeights,
                      n_diverse: int, weights: ScoreWeights,
                      constrain=None):
    from ndivplanning_tpu.planning.cem import _cem_impl, cem_population

    k_cem, _ = jax.random.split(key)
    n, elite, iters = cem_population(cfg)
    cem_plan, _ = _cem_impl(cfg, state, scene, condition, k_cem, n, elite,
                            iters, 0.25, 0.05, n_diverse, weights,
                            constrain=constrain)
    # Warm-start trajopt from CEM's TOP final candidates: CEM's global
    # latent search picks the basins (the only measured quadrotor
    # winner, BASELINE.md r3j), the tau optimiser slides within them.
    # CEM's tracked best rides in its final population, so it is always
    # among the top-m seeds — with the union selection that makes the
    # hybrid >= CEM >= one-shot by construction.
    m = max(n // 4, 2)
    sel = jnp.where(jnp.isfinite(cem_plan.scores), cem_plan.scores, jnp.inf)
    _, top_idx = jax.lax.top_k(-sel, m)
    return _trajopt_core(cfg, scene, cem_plan.taus[top_idx], n_steps, lr,
                         soft, n_diverse, weights, constrain=constrain)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_steps", "lr", "soft", "n_diverse", "weights"))
def plan_cem_trajopt(cfg: Config, state: TrainState, scene: Scene,
                     condition: jnp.ndarray, key: jax.Array,
                     n_steps: int | None = None, lr: float | None = None,
                     soft: SoftWeights = SoftWeights(), n_diverse: int = 8,
                     weights: ScoreWeights = ScoreWeights()):
    """CEM->trajopt hybrid for one scene: global latent CEM search, then
    direct tau optimisation from its elite survivors (``--refine
    cem+trajopt``).  Returns ``(PlanResult, loss_curve)`` with the
    trajopt stage's soft-objective curve."""
    _, steps, lr = resolve_budget(cfg, None, n_steps, lr)
    return _cem_trajopt_impl(cfg, state, scene, condition, key, steps, lr,
                             soft, n_diverse, weights)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_steps", "lr", "soft", "n_diverse", "weights"))
def plan_cem_trajopt_batch(cfg: Config, state: TrainState, scenes: Scene,
                           conditions: jnp.ndarray, keys: jax.Array,
                           n_steps: int | None = None,
                           lr: float | None = None,
                           soft: SoftWeights = SoftWeights(),
                           n_diverse: int = 8,
                           weights: ScoreWeights = ScoreWeights()):
    """Batched :func:`plan_cem_trajopt` (vmap over scenes)."""
    _, steps, lr = resolve_budget(cfg, None, n_steps, lr)
    return jax.vmap(
        lambda sc, co, k: _cem_trajopt_impl(cfg, state, sc, co, k, steps,
                                            lr, soft, n_diverse, weights)
    )(scenes, conditions, keys)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_candidates", "n_steps", "lr", "soft", "n_diverse", "weights"))
def plan_trajopt_batch(cfg: Config, state: TrainState, scenes: Scene,
                       conditions: jnp.ndarray, keys: jax.Array,
                       n_candidates: int | None = None,
                       n_steps: int | None = None, lr: float | None = None,
                       soft: SoftWeights = SoftWeights(), n_diverse: int = 8,
                       weights: ScoreWeights = ScoreWeights()):
    """Batched :func:`plan_trajopt` (vmap over scenes, same program)."""
    n, steps, lr = resolve_budget(cfg, n_candidates, n_steps, lr)
    return jax.vmap(
        lambda sc, co, k: _trajopt_impl(cfg, state, sc, co, k, n, steps,
                                        lr, soft, n_diverse, weights)
    )(scenes, conditions, keys)
