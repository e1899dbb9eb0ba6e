"""CEM latent refinement: iterative sim-in-the-loop planning (L5 extra).

Beyond-reference planning capability (the reference's §3.3 loop draws one
batch of candidates and picks the best — SURVEY.md §3.3): the
cross-entropy method run in the generator's LATENT space.  Each iteration
draws ``n`` latents from a diagonal Gaussian, decodes them through G,
scores the trajectories sim-in-the-loop, and refits the Gaussian to the
elite fraction.  Because the generator compresses trajectory space into a
tiny latent (dim 2 in every preset), a handful of CEM iterations search
it far more effectively than one-shot sampling at the same budget.

TPU-native shape: the whole refinement — every draw, decode, rollout,
elite refit — is ONE jitted program (``lax.scan`` over iterations on top
of the vmapped rollout scorer); no host round-trips between iterations,
so the tunnel's ~35 ms dispatch overhead is paid once per plan, not once
per iteration.

Guarantee (tested): iteration 1 samples the N(0, I) prior — exactly the
one-shot planner's proposal distribution — and the best-so-far latent is
tracked across iterations, so ``plan_cem``'s final best score is
(weakly) monotone in the iteration count and never worse than its own
prior draw.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ndivplanning_tpu.envs.rollout import ScoreWeights
from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.planning.planner import (
    PlanResult,
    _diverse_top_m,
    decode_latents as _decode,
    score_rollouts,
)
from ndivplanning_tpu.train.state import TrainState
from ndivplanning_tpu.utils.config import Config



def _cem_impl(cfg: Config, state: TrainState, scene: Scene,
              condition: jnp.ndarray, key: jax.Array, n: int,
              n_elite: int, n_iters: int, momentum: float,
              sigma_floor: float, n_diverse: int,
              weights: ScoreWeights,
              constrain=None) -> tuple[PlanResult, jnp.ndarray]:
    zdim = cfg.latent_dim
    # ``constrain`` (optional) pins population-axis arrays to a mesh
    # layout — the candidate-sharding hook (parallel/sharded_plan.py::
    # make_sharded_cem).  Identity when unsharded.
    cst = constrain if constrain is not None else (lambda a: a)

    def iteration(carry, _):
        mu, sigma, best_z, best_score, key = carry
        key, sub = jax.random.split(key)
        z = cst(mu + sigma * jax.random.normal(sub, (n, zdim)))
        taus = cst(_decode(cfg, state, condition, z))
        results = score_rollouts(cfg, scene, taus, weights)
        results = results._replace(score=cst(results.score))
        # NaN candidates must not become elites: top_k(-scores) ranks
        # NaN first, which would poison mu/sigma for every remaining
        # iteration (the best-so-far guard below already rejects them,
        # but the refit needs the same protection).
        scores = jnp.where(jnp.isfinite(results.score), results.score,
                           jnp.inf)

        # Elite refit (momentum-smoothed, floored sigma for exploration).
        _, elite_idx = jax.lax.top_k(-scores, n_elite)
        elite = z[elite_idx]
        new_mu = momentum * mu + (1.0 - momentum) * jnp.mean(elite, axis=0)
        new_sigma = momentum * sigma + (1.0 - momentum) * jnp.maximum(
            jnp.std(elite, axis=0), sigma_floor)

        # Best-so-far tracking (the monotonicity guarantee).
        it_best = jnp.argmin(scores)
        improved = scores[it_best] < best_score
        best_z = jnp.where(improved, z[it_best], best_z)
        # where(improved, ...) not jnp.minimum: minimum propagates a NaN
        # score into best_score forever (all later < comparisons False),
        # freezing the tracker even when later populations are clean.
        best_score = jnp.where(improved, scores[it_best], best_score)
        return ((new_mu, new_sigma, best_z, best_score, key),
                best_score)

    init = (
        jnp.zeros((zdim,)),  # prior mean: iteration 1 == one-shot proposal
        jnp.ones((zdim,)),  # prior scale
        jnp.zeros((zdim,)),
        jnp.asarray(jnp.inf),
        key,
    )
    (mu, sigma, best_z, _, key), best_curve = jax.lax.scan(
        iteration, init, None, length=n_iters)

    # Final population from the refined Gaussian, with the tracked best
    # latent injected at slot 0 — the returned best can only improve on
    # the best-so-far (G is deterministic given z, so re-decoding best_z
    # reproduces its trajectory exactly).
    key, sub = jax.random.split(key)
    z = mu + sigma * jax.random.normal(sub, (n, zdim))
    z = cst(z.at[0].set(best_z))
    taus = cst(_decode(cfg, state, condition, z))
    results = score_rollouts(cfg, scene, taus, weights)
    results = results._replace(score=cst(results.score))

    # Same NaN guard for the final selection: argmin over NaN picks the
    # NaN. Slot 0 (the tracked best) is finite whenever any iteration
    # produced a finite score, so the sanitized argmin stays valid.
    final_scores = jnp.where(jnp.isfinite(results.score), results.score,
                             jnp.inf)
    best = jnp.argmin(final_scores)
    diverse_idx = _diverse_top_m(taus.reshape(n, -1), final_scores,
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
    return plan, best_curve


def cem_population(cfg: Config, n_candidates: int | None = None,
                   n_iters: int | None = None) -> tuple[int, int, int]:
    """Resolve ``(population, default_elite, iters)`` for CEM planning —
    the SINGLE source of the default budget split, shared by
    :func:`plan_cem` / :func:`plan_cem_batch` and the export path
    (utils/export.py bakes the population into the StableHLO artifact
    and advertises it in the manifest; a drifted copy of this formula
    would make the manifest lie about the artifact).

    Population defaults to ``cfg.n_candidates // (iters + 1)`` so the
    TOTAL rollout budget ``(iters + 1) * population`` matches the
    one-shot planner's ``n_candidates``; elite = 10% of the population
    (>= 2)."""
    iters = cfg.cem_iters if n_iters is None else n_iters
    n = (max(cfg.n_candidates // (iters + 1), 2)
         if n_candidates is None else n_candidates)
    return n, max(n // 10, 2), iters


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_candidates", "n_elite", "n_iters", "momentum", "sigma_floor",
    "n_diverse", "weights"))
def plan_cem(cfg: Config, state: TrainState, scene: Scene,
             condition: jnp.ndarray, key: jax.Array,
             n_candidates: int | None = None, n_elite: int | None = None,
             n_iters: int | None = None, momentum: float = 0.25,
             sigma_floor: float = 0.05, n_diverse: int = 8,
             weights: ScoreWeights = ScoreWeights()):
    """CEM-refined planning for one scene.

    Returns ``(PlanResult, best_curve)`` where ``best_curve [n_iters]``
    is the best-so-far score after each iteration (monotone
    non-increasing — the refinement-progress signal).

    Defaults: population = ``cfg.n_candidates / (cem_iters + 1)`` —
    the scan runs ``cem_iters`` populations plus one final population
    from the refined Gaussian, so this makes the TOTAL rollout budget
    (``(cem_iters+1) * n``) match the one-shot planner's
    ``n_candidates``; elite = 10% of the population (>= 2).
    """
    n, default_elite, iters = cem_population(cfg, n_candidates, n_iters)
    elite = default_elite if n_elite is None else n_elite
    return _cem_impl(cfg, state, scene, condition, key, n, elite, iters,
                     momentum, sigma_floor, n_diverse, weights)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_candidates", "n_elite", "n_iters", "momentum", "sigma_floor",
    "n_diverse", "weights"))
def plan_cem_batch(cfg: Config, state: TrainState, scenes: Scene,
                   conditions: jnp.ndarray, keys: jax.Array,
                   n_candidates: int | None = None,
                   n_elite: int | None = None, n_iters: int | None = None,
                   momentum: float = 0.25, sigma_floor: float = 0.05,
                   n_diverse: int = 8,
                   weights: ScoreWeights = ScoreWeights()):
    """Batched ``plan_cem`` (vmap over scenes, same program)."""
    n, default_elite, iters = cem_population(cfg, n_candidates, n_iters)
    elite = default_elite if n_elite is None else n_elite
    return jax.vmap(
        lambda sc, co, k: _cem_impl(cfg, state, sc, co, k, n, elite, iters,
                                    momentum, sigma_floor, n_diverse,
                                    weights)
    )(scenes, conditions, keys)
