"""Candidate-axis sharded planning: ONE scene's candidates over the mesh.

SURVEY.md §3.3's planning loop at pod scale has two parallel axes.
``plan_batch`` shards the SCENE axis over ``dp`` (the throughput /
eval-suite path — tests/test_parallel.py::test_plan_batch_shards_over_dp),
but a latency-critical single-scene request under that layout leaves
every device except one idle.  :func:`make_sharded_plan` shards the
CANDIDATE axis instead: the 1000-candidate generate → rollout → select
pipeline is embarrassingly parallel over candidates until the final
selection, which needs only the N scores plus the better-scoring half of
the trajectories (N=1000, H=32, S=4 → ~0.5 MB) gathered over ICI.

Same-program-with-sharding-constraints pattern as
``make_sharded_train_step`` (parallel/sharded_step.py): the body is
``_plan_impl``'s exact math with ``with_sharding_constraint`` pinning the
candidate axis to the full mesh, so XLA's SPMD partitioner splits the
generator matmuls and the vmapped ``lax.scan`` rollouts per device and
inserts the gathers for the replicated selection.  Parity with the
unsharded :func:`~ndivplanning_tpu.planning.planner.plan` is structural
(identical program) and pinned numerically on the virtual 8-device mesh
(tests/test_parallel.py::test_sharded_plan_matches_unsharded).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ndivplanning_tpu.envs.rollout import ScoreWeights
from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.parallel.mesh import DIV_AXIS, DP_AXIS, make_mesh
from ndivplanning_tpu.planning.planner import (
    PlanResult,
    _diverse_top_m,
    generate_candidates,
    score_rollouts,
)
from ndivplanning_tpu.train.state import TrainState
from ndivplanning_tpu.utils.config import Config


def make_sharded_plan(cfg: Config, mesh: Mesh | None = None,
                      n_candidates: int | None = None, n_diverse: int = 8,
                      weights: ScoreWeights = ScoreWeights()):
    """Build the jitted candidate-sharded single-scene planner.

    Returns ``(plan_fn, mesh)`` with
    ``plan_fn(state, scene, condition, key) -> PlanResult``; ``state``
    should be replicated (``shard_state``), scene/condition/key are
    replicated scalars from XLA's point of view.  The candidate axis is
    sharded over BOTH mesh axes — planning has no diversity-sample axis,
    so ``div`` devices join the candidate split rather than idling.

    ``n_candidates`` need not divide the device count: the internal
    constraints still split the compute (GSPMD pads the uneven shard),
    but the candidate-axis OUTPUT layout is only pinned when N divides
    the mesh (``jit out_shardings`` rejects uneven explicit layouts).
    """
    if mesh is None:
        mesh = make_mesh(cfg=cfg)
    n = cfg.n_candidates if n_candidates is None else n_candidates
    cand = NamedSharding(mesh, P((DP_AXIS, DIV_AXIS)))
    replicated = NamedSharding(mesh, P())

    def body(state: TrainState, scene: Scene, condition: jnp.ndarray,
             key: jax.Array) -> PlanResult:
        taus = generate_candidates(cfg, state, condition, key, n)
        taus = jax.lax.with_sharding_constraint(taus, cand)
        results = score_rollouts(cfg, scene, taus, weights)
        scores = jax.lax.with_sharding_constraint(results.score, cand)

        # NaN-safe selection, identical to _plan_impl.
        sel_scores = jnp.where(jnp.isfinite(scores), scores, jnp.inf)
        best = jnp.argmin(sel_scores)
        flat = taus.reshape(n, -1)
        diverse_idx = _diverse_top_m(flat, sel_scores, n_diverse)
        return PlanResult(
            best_traj=taus[best],
            best_score=results.score[best],
            best_reached=results.reached[best],
            diverse_idx=diverse_idx,
            diverse_trajs=taus[diverse_idx],
            scores=results.score,
            taus=taus,
        )

    even = n % (mesh.shape[DP_AXIS] * mesh.shape[DIV_AXIS]) == 0
    if even:
        # [N] / [N, H, S] stay sharded; callers fetch only the small
        # replicated fields.  Uneven N: leave the output layout to GSPMD
        # (explicit uneven out_shardings are rejected by jit).
        out = PlanResult(
            best_traj=replicated, best_score=replicated,
            best_reached=replicated, diverse_idx=replicated,
            diverse_trajs=replicated, scores=cand, taus=cand,
        )
        plan_fn = jax.jit(body, out_shardings=out)
    else:
        plan_fn = jax.jit(body)
    return plan_fn, mesh


def make_sharded_cem(cfg: Config, mesh: Mesh | None = None,
                     n_candidates: int | None = None,
                     n_elite: int | None = None,
                     n_iters: int | None = None, momentum: float = 0.25,
                     sigma_floor: float = 0.05, n_diverse: int = 8,
                     weights: ScoreWeights = ScoreWeights()):
    """Candidate-sharded CEM refinement (the measured-best planning mode
    on a pod's latency path).

    Same construction as :func:`make_sharded_plan`, threaded through
    ``_cem_impl``'s ``constrain`` hook: every iteration's population
    draw → decode → rollout is pinned ``P(('dp','div'))`` on the
    population axis, the elite refit (top-k over the [n] scores +
    mean/std of [n_elite, zdim] latents — bytes, not megabytes) runs
    replicated, and the scan keeps all ``cem_iters`` iterations inside
    one program with the collectives in the scan body.

    Returns ``(cem_fn, mesh)``;
    ``cem_fn(state, scene, condition, key) -> (PlanResult, best_curve)``
    is numerically the unsharded :func:`~ndivplanning_tpu.planning.cem.
    plan_cem` (same draws — the constraint changes layout, not values).
    """
    from ndivplanning_tpu.planning.cem import _cem_impl, cem_population

    if mesh is None:
        mesh = make_mesh(cfg=cfg)
    n, default_elite, iters = cem_population(cfg, n_candidates, n_iters)
    elite = default_elite if n_elite is None else n_elite
    cand = NamedSharding(mesh, P((DP_AXIS, DIV_AXIS)))

    def body(state: TrainState, scene: Scene, condition: jnp.ndarray,
             key: jax.Array):
        return _cem_impl(
            cfg, state, scene, condition, key, n, elite, iters,
            momentum, sigma_floor, n_diverse, weights,
            constrain=lambda a: jax.lax.with_sharding_constraint(a, cand),
        )

    return jax.jit(body), mesh


def make_sharded_grad(cfg: Config, mesh: Mesh | None = None,
                      n_candidates: int | None = None,
                      n_steps: int | None = None, lr: float = 0.1,
                      soft=None, n_diverse: int = 8,
                      weights: ScoreWeights = ScoreWeights()):
    """Candidate-sharded gradient refinement: the Adam-through-G-and-env
    loop (planning/grad_refine.py) with the population axis pinned over
    the mesh.  Each Adam step's forward+backward rollout pass is
    embarrassingly parallel over candidates (the soft objective is a sum
    of per-candidate terms, so its gradient never crosses candidates);
    only the final union hard-score selection gathers.

    Returns ``(grad_fn, mesh)``;
    ``grad_fn(state, scene, condition, key) -> (PlanResult, loss_curve)``
    numerically matches the unsharded
    :func:`~ndivplanning_tpu.planning.grad_refine.plan_grad`.
    """
    from ndivplanning_tpu.planning.grad_refine import (
        SoftWeights,
        _grad_impl,
    )

    if mesh is None:
        mesh = make_mesh(cfg=cfg)
    n = (max(cfg.n_candidates // 4, 2)
         if n_candidates is None else n_candidates)
    steps = cfg.grad_refine_steps if n_steps is None else n_steps
    soft = SoftWeights() if soft is None else soft
    cand = NamedSharding(mesh, P((DP_AXIS, DIV_AXIS)))

    def body(state: TrainState, scene: Scene, condition: jnp.ndarray,
             key: jax.Array):
        return _grad_impl(
            cfg, state, scene, condition, key, n, steps, lr, soft,
            n_diverse, weights,
            constrain=lambda a: jax.lax.with_sharding_constraint(a, cand),
        )

    return jax.jit(body), mesh


def make_sharded_trajopt(cfg: Config, mesh: Mesh | None = None,
                         n_candidates: int | None = None,
                         n_steps: int | None = None, lr: float | None = None,
                         soft=None, n_diverse: int = 8,
                         weights: ScoreWeights = ScoreWeights()):
    """Candidate-sharded direct trajectory optimisation: the Adam-on-tau
    loop (planning/trajopt.py) with the population axis pinned over the
    mesh.  Like the latent refiner, each Adam step's forward+backward
    rollout pass is embarrassingly parallel over candidates (the soft
    objective never crosses candidates); only the final union hard-score
    selection gathers.

    Returns ``(trajopt_fn, mesh)``;
    ``trajopt_fn(state, scene, condition, key) -> (PlanResult, loss_curve)``
    numerically matches the unsharded
    :func:`~ndivplanning_tpu.planning.trajopt.plan_trajopt`.
    """
    from ndivplanning_tpu.planning.grad_refine import SoftWeights
    from ndivplanning_tpu.planning.trajopt import (
        _trajopt_impl,
        resolve_budget,
    )

    if mesh is None:
        mesh = make_mesh(cfg=cfg)
    n, steps, lr = resolve_budget(cfg, n_candidates, n_steps, lr)
    soft = SoftWeights() if soft is None else soft
    cand = NamedSharding(mesh, P((DP_AXIS, DIV_AXIS)))

    def body(state: TrainState, scene: Scene, condition: jnp.ndarray,
             key: jax.Array):
        return _trajopt_impl(
            cfg, state, scene, condition, key, n, steps, lr, soft,
            n_diverse, weights,
            constrain=lambda a: jax.lax.with_sharding_constraint(a, cand),
        )

    return jax.jit(body), mesh


def make_sharded_ilqr(cfg: Config, mesh: Mesh | None = None,
                      n_candidates: int | None = None,
                      n_iters: int | None = None, reg0: float = 1.0,
                      soft=None, n_diverse: int = 8,
                      weights: ScoreWeights = ScoreWeights()):
    """Candidate-sharded iLQR refinement (planning/ilqr.py): the
    warm-start axis pinned over the mesh, so each device runs its shard
    of the vmapped linearise -> Riccati -> parallel-line-search programs
    independently — iLQR is the heaviest per-candidate refiner (the
    whole point of sharding it), and nothing crosses candidates until
    the final union hard-score selection.

    Returns ``(ilqr_fn, mesh)``;
    ``ilqr_fn(state, scene, condition, key) -> (PlanResult, cost_curve)``
    numerically matches the unsharded
    :func:`~ndivplanning_tpu.planning.ilqr.plan_ilqr`.
    """
    from ndivplanning_tpu.planning.grad_refine import SoftWeights
    from ndivplanning_tpu.planning.ilqr import (
        _ilqr_impl,
        resolve_ilqr_budget,
    )

    if mesh is None:
        mesh = make_mesh(cfg=cfg)
    n, iters = resolve_ilqr_budget(cfg, n_candidates, n_iters)
    soft = SoftWeights() if soft is None else soft
    cand = NamedSharding(mesh, P((DP_AXIS, DIV_AXIS)))

    def body(state: TrainState, scene: Scene, condition: jnp.ndarray,
             key: jax.Array):
        return _ilqr_impl(
            cfg, state, scene, condition, key, n, iters, soft, reg0,
            n_diverse, weights,
            constrain=lambda a: jax.lax.with_sharding_constraint(a, cand),
        )

    return jax.jit(body), mesh


def make_sharded_cem_trajopt(cfg: Config, mesh: Mesh | None = None,
                             n_steps: int | None = None,
                             lr: float | None = None, soft=None,
                             n_diverse: int = 8,
                             weights: ScoreWeights = ScoreWeights()):
    """Candidate-sharded CEM->trajopt hybrid (planning/trajopt.py
    ``plan_cem_trajopt``): the CEM stage's population axis and the
    trajopt stage's elite-seed axis are both pinned over the mesh; the
    only cross-candidate points are CEM's replicated elite refit
    (bytes), the top-m gather between the stages, and the final union
    selection.

    Returns ``(hybrid_fn, mesh)``;
    ``hybrid_fn(state, scene, condition, key) -> (PlanResult, loss_curve)``
    numerically matches the unsharded ``plan_cem_trajopt``.
    """
    from ndivplanning_tpu.planning.grad_refine import SoftWeights
    from ndivplanning_tpu.planning.trajopt import (
        _cem_trajopt_impl,
        resolve_budget,
    )

    if mesh is None:
        mesh = make_mesh(cfg=cfg)
    _, steps, lr = resolve_budget(cfg, None, n_steps, lr)
    soft = SoftWeights() if soft is None else soft
    cand = NamedSharding(mesh, P((DP_AXIS, DIV_AXIS)))

    def body(state: TrainState, scene: Scene, condition: jnp.ndarray,
             key: jax.Array):
        return _cem_trajopt_impl(
            cfg, state, scene, condition, key, steps, lr, soft,
            n_diverse, weights,
            constrain=lambda a: jax.lax.with_sharding_constraint(a, cand),
        )

    return jax.jit(body), mesh
