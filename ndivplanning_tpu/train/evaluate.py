"""Evaluation: diversity / quality / rollout-success metrics (C10).

SURVEY.md §3.5: sample conditions, draw k latents, generate, then
- diversity: mean pairwise L2 between the k trajectories per condition,
  plus the NDiv loss value itself (the tracked metric, BASELINE.json:2),
- quality: endpoint distance to goal,
- planning: roll every generated trajectory through the env
  (vmap over B x k of the lax.scan rollout) for success/collision rates.

All jitted; one device->host transfer for the final scalar dict.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ndivplanning_tpu.data.tasks import make_task, task_fingerprint
from ndivplanning_tpu.envs.rollout import ScoreWeights, _rollout_scan
from ndivplanning_tpu.ops.ndiv import ndiv_loss_reference
from ndivplanning_tpu.ops.pairwise import pairwise_l2
from ndivplanning_tpu.train.state import (
    TrainState,
    build_models,
    gen_params,
)
from ndivplanning_tpu.utils.config import Config


@functools.partial(jax.jit, static_argnames=("cfg", "eval_batch", "use_ema"))
def evaluate(cfg: Config, state: TrainState, key: jax.Array,
             eval_batch: int = 64, use_ema: bool = True):
    """Returns a dict of f32 scalars (see module docstring).

    Samples a fresh batch from the synthetic task sampler; for a FIXED
    evaluation set (held-out scenes, dataset slices, the frozen eval
    suite) use :func:`evaluate_on_batch`.
    """
    task = make_task(cfg)
    k_batch, k_z = jax.random.split(key)
    batch = task.sample(k_batch, eval_batch)
    return _evaluate_impl(cfg, state, k_z, batch, use_ema=use_ema)


@functools.partial(jax.jit, static_argnames=("cfg", "use_ema"))
def evaluate_on_batch(cfg: Config, state: TrainState, key: jax.Array,
                      batch, use_ema: bool = True):
    """Same metrics as :func:`evaluate` but on a CALLER-PROVIDED batch
    (conditions + real scenes) — the honest-eval path for recorded
    datasets and the frozen eval protocol: success/collision use the
    batch's true scenes rather than freshly sampled ones.

    ``use_ema=False`` evaluates the RAW generator weights even when the
    config tracks EMA ones — the second leg of the best-of-both
    checkpoint selection in train() (the EMA curve is smoother but its
    peak can sit below the raw generator's best oscillation)."""
    return _evaluate_impl(cfg, state, key, batch, use_ema=use_ema)


# Frozen eval protocol (round-2): suite scenes and the eval latent draws
# use FIXED keys independent of cfg.seed/training step, so quality
# numbers from different runs/rounds at the same checkpoint agree to the
# digit instead of re-sampling luck.
EVAL_SUITE_SEED = 0xE7A1
EVAL_SUITE_SIZE = 512


# Keyed on task_fingerprint (the fields make_task actually consumes,
# owned by data/tasks.py next to make_task) — keying on the FULL Config
# made byte-identical suites (an imagecond suite is ~200 MB of
# rasterised scenes) occupy separate slots for configs differing only
# in workdir/steps/lr (round-2 verdict weak #4), and reconstructing a
# surrogate config from a hardcoded preset would silently desync the
# moment make_task grew a new field dependency (round-3 review).
_SUITE_CACHE: dict = {}
_SUITE_CACHE_MAX = 8


def make_eval_suite(cfg: Config, n_scenes: int = EVAL_SUITE_SIZE,
                    seed: int = EVAL_SUITE_SEED):
    """The preset's frozen evaluation set: a fixed batch of scenes/
    conditions/expert trajectories keyed only by
    ``task_fingerprint(cfg)`` (the config fields the task sampler
    reads) plus (n_scenes, seed) — NOT by the training seed or any
    other config field.

    Cached: train() calls this every ``eval_every`` steps, and re-running
    the eager scene-sampling graph costs many ~35 ms dispatches per call
    on the TPU tunnel for a byte-identical result.
    """
    key = (task_fingerprint(cfg), n_scenes, seed)
    suite = _SUITE_CACHE.get(key)
    if suite is None:
        while len(_SUITE_CACHE) >= _SUITE_CACHE_MAX:  # FIFO bound
            _SUITE_CACHE.pop(next(iter(_SUITE_CACHE)))
        suite = make_task(cfg).sample(jax.random.PRNGKey(seed), n_scenes)
        _SUITE_CACHE[key] = suite
    return suite


def evaluate_fixed(cfg: Config, state: TrainState,
                   n_scenes: int = EVAL_SUITE_SIZE,
                   seed: int = EVAL_SUITE_SEED, use_ema: bool = True):
    """Metrics on the frozen suite with frozen latents: reproducible to
    the digit for a given checkpoint (tests/test_evaluate_plan.py)."""
    suite = make_eval_suite(cfg, n_scenes, seed)
    return evaluate_on_batch(cfg, state, jax.random.PRNGKey(seed + 1),
                             suite, use_ema=use_ema)


def evaluate_fixed_mpc(cfg: Config, state: TrainState,
                       n_scenes: int = EVAL_SUITE_SIZE,
                       seed: int = EVAL_SUITE_SEED,
                       total_steps: int = 64, replan_every: int = 8,
                       n_candidates: int = 256,
                       scene_chunk: int = 128):
    """CLOSED-LOOP quality on the frozen suite: every suite scene is run
    as a receding-horizon MPC episode (`planning/mpc.py::
    mpc_rollout_batch` — replan from the live state every
    ``replan_every`` steps), with fixed per-scene keys, so closed-loop
    success/collision are run-to-run comparable exactly like the
    open-loop :func:`evaluate_fixed` numbers.

    The suite is dispatched in ``scene_chunk``-episode batches: a single
    device execution much past ~1 minute crashes the axon TPU worker
    (CLAUDE.md round 3), and 512 episodes x candidates x rollouts in one
    vmapped program could cross that at large episode parameters.  The
    chunk size is part of the frozen protocol (per-scene keys are fixed
    regardless, but different batch shapes are different XLA programs —
    expect 1-ulp-class drift only, as everywhere).  Returns
    ``eval_mpc_success_rate`` / ``eval_mpc_collision_rate`` plus the
    episode parameters (so a metrics row is self-describing).
    """
    from ndivplanning_tpu.planning.mpc import mpc_rollout_batch

    suite = make_eval_suite(cfg, n_scenes, seed)
    keys = jax.random.split(jax.random.PRNGKey(seed + 2), n_scenes)
    reached_parts, collided_parts = [], []
    for lo in range(0, n_scenes, scene_chunk):
        hi = min(lo + scene_chunk, n_scenes)
        sl = slice(lo, hi)
        result = mpc_rollout_batch(
            cfg, state,
            jax.tree.map(lambda a: a[sl], suite.scenes),
            suite.conditions[sl], keys[sl],
            total_steps=total_steps, replan_every=replan_every,
            n_candidates=n_candidates)
        r, c = jax.device_get((result.reached, result.collided))
        reached_parts.append(r)
        collided_parts.append(c)
    import numpy as np

    reached = np.concatenate(reached_parts)
    collided = np.concatenate(collided_parts)
    return {
        "eval_mpc_success_rate": float(np.mean(reached)),
        "eval_mpc_collision_rate": float(np.mean(collided)),
        "eval_mpc_total_steps": float(total_steps),
        "eval_mpc_replan_every": float(replan_every),
        "eval_mpc_candidates": float(n_candidates),
    }


def evaluate_fixed_planner(cfg: Config, state: TrainState,
                           planner: str = "oneshot",
                           n_scenes: int = EVAL_SUITE_SIZE,
                           seed: int = EVAL_SUITE_SEED,
                           scene_chunk: int | None = None):
    """OPEN-LOOP planner quality on the frozen suite: every suite scene
    is planned once with the chosen planner family and the best
    candidate's hard score / reach is recorded — the suite-scale planner
    ladder (previously only in benchmarks/ilqr_bench.py et al.) as a
    first-class protocol, run-to-run comparable like
    :func:`evaluate_fixed` (``eval --planner X`` in the CLI).

    Chunked dispatches for the same reason as the MPC suite (the
    >1-minute-dispatch worker-crash class — CLAUDE.md round 3); the
    refiners default to smaller chunks than the one-shot planner because
    their per-scene programs are 10-100x heavier (the measured
    ILQR_CHUNK=16 discipline from the round-4 quadrotor study).

    Returns ``eval_plan_best_score`` (suite mean of per-scene best hard
    scores — LOWER is better, unlike the success rates elsewhere),
    ``eval_plan_reach_rate``, and the planner echo.
    """
    if planner == "oneshot":
        from ndivplanning_tpu.planning.planner import plan_batch as _pb
        fn = lambda sc, co, k: plan_batch_result(_pb(cfg, state, sc, co, k))
        chunk = 128 if scene_chunk is None else scene_chunk
    else:
        if planner == "cem":
            from ndivplanning_tpu.planning.cem import plan_cem_batch as _b
        elif planner == "grad":
            from ndivplanning_tpu.planning.grad_refine import (
                plan_grad_batch as _b,
            )
        elif planner == "trajopt":
            from ndivplanning_tpu.planning.trajopt import (
                plan_trajopt_batch as _b,
            )
        elif planner == "ilqr":
            from ndivplanning_tpu.planning.ilqr import plan_ilqr_batch as _b
        elif planner == "cem+trajopt":
            from ndivplanning_tpu.planning.trajopt import (
                plan_cem_trajopt_batch as _b,
            )
        else:
            raise ValueError(
                f"unknown planner {planner!r}; choose from ['oneshot', "
                "'cem', 'grad', 'trajopt', 'ilqr', 'cem+trajopt']")
        fn = lambda sc, co, k: plan_batch_result(_b(cfg, state, sc, co, k)[0])
        chunk = 16 if scene_chunk is None else scene_chunk

    import numpy as np

    suite = make_eval_suite(cfg, n_scenes, seed)
    keys = jax.random.split(jax.random.PRNGKey(seed + 3), n_scenes)
    scores, reached = [], []
    for lo in range(0, n_scenes, chunk):
        hi = min(lo + chunk, n_scenes)
        s, r = fn(jax.tree.map(lambda a: a[lo:hi], suite.scenes),
                  suite.conditions[lo:hi], keys[lo:hi])
        scores.append(np.asarray(jax.device_get(s)))
        reached.append(np.asarray(jax.device_get(r)))
    scores = np.concatenate(scores)
    reached = np.concatenate(reached)
    return {
        "eval_plan_best_score": float(np.mean(scores)),
        "eval_plan_reach_rate": float(np.mean(reached)),
        "eval_plan_n_scenes": float(n_scenes),
        "eval_planner": planner,
    }


def plan_batch_result(result):
    """(best_score[B], best_reached[B]) from a batched PlanResult."""
    return result.best_score, result.best_reached


def _evaluate_impl(cfg: Config, state: TrainState, k_z: jax.Array, batch,
                   use_ema: bool = True):
    eval_batch = batch.real_traj.shape[0]
    gen, _ = build_models(cfg)
    z = jax.random.normal(k_z, (eval_batch, cfg.k, cfg.latent_dim))
    params = gen_params(cfg, state) if use_ema else state.g_params
    taus = gen.apply(params, batch.conditions, z)  # [B, k, H, S]
    flat = taus.reshape(eval_batch, cfg.k, -1)

    # Diversity
    pd = pairwise_l2(flat)  # [B, k, k]
    off = ~jnp.eye(cfg.k, dtype=bool)
    mean_pairwise = jnp.sum(jnp.where(off, pd, 0.0)) / (
        eval_batch * cfg.k * (cfg.k - 1)
    )
    ndiv = ndiv_loss_reference(z, flat, cfg.ndiv_alpha)

    # Quality: trajectory endpoint vs scene goal.  In waypoint mode the
    # endpoint is the last emitted waypoint; in action mode tau rows are
    # actions (positions come only from rolling out), so endpoint_err is
    # filled from the rollout's final goal distance below instead.
    if cfg.rollout_mode == "waypoints":
        endpoints = taus[:, :, -1, :]  # [B, k, S]
        goal = batch.scenes.goal[:, None, :]
        endpoint_err = jnp.mean(
            jnp.sqrt(jnp.sum(jnp.square(endpoints - goal), axis=-1))
        )
    else:
        endpoint_err = None  # filled from per_cond.goal_dist below

    # Sim-in-the-loop: roll all B*k generated trajectories
    from ndivplanning_tpu.envs.registry import get_env

    params = get_env(cfg.env).make_params()
    weights = ScoreWeights()

    def roll_one(scene, tau):
        return _rollout_scan(params, scene, tau, cfg.rollout_mode, weights,
                             env=cfg.env)

    per_cond = jax.vmap(
        lambda scene, taus_k: jax.vmap(lambda t: roll_one(scene, t))(taus_k)
    )(batch.scenes, taus)
    if endpoint_err is None:
        endpoint_err = jnp.mean(per_cond.goal_dist)
        # Rolled-out final positions stand in for waypoint endpoints —
        # the mode-coverage block below reads `endpoints` for every
        # conditioning, so action mode must define them too.
        endpoints = per_cond.positions[:, :, -1, :]
    out = {
        "eval_mean_pairwise_dist": mean_pairwise,
        "eval_ndiv": ndiv,
        "eval_endpoint_err": endpoint_err,
        "eval_success_rate": jnp.mean(per_cond.reached),
        "eval_collision_rate": jnp.mean(per_cond.collided),
        "eval_mean_score": jnp.mean(per_cond.score),
    }
    if cfg.conditioning == "none":
        # Mode coverage (NDiv-paper-style): the unconditioned task's data
        # modes are 8 anchor goals on a circle around (.5,.5); coverage =
        # fraction of angular bins hit by the k samples per condition.
        # Interpretation ceiling: a PERFECTLY uniform generator drawing k
        # samples over M modes expects 1-(1-1/M)^k — for k=8, M=8 that is
        # ~0.656, which trained runs reach (benchmarks/
        # convergence_results.json: 0.652); higher would mean the sampler
        # anti-correlates modes within a draw, not better distribution fit.
        n_modes = 8
        ang = jnp.arctan2(endpoints[..., 1] - 0.5, endpoints[..., 0] - 0.5)
        # Bin CENTRES on the anchors (round, not floor): the anchors sit
        # at 2*pi*m/8 exactly, so floor-binning would put every mode on a
        # bin edge and split it across two bins.
        bins = jnp.floor(ang / (2.0 * jnp.pi / n_modes) + 0.5)
        bins = jnp.mod(bins, n_modes).astype(jnp.int32)  # [B, k]
        hit = jax.nn.one_hot(bins, n_modes).max(axis=1)  # [B, n_modes]
        out["eval_mode_coverage"] = jnp.mean(jnp.sum(hit, axis=-1) / n_modes)
    return out
