"""iLQR trajectory refinement: second-order planning for hard dynamics.

Fourth refinement mode (alongside latent CEM, latent gradient descent,
and first-order direct trajopt).  Round 3 measured the gap this fills:
first-order trajopt dominates every KINEMATIC family (4.1-6.4x better
best score) but is an honest negative on the underactuated quadrotor,
where gradients through the cascaded controller are too weak to shape
an action profile (BASELINE.md r3j).  iLQR attacks exactly that regime:
it linearises the TRUE dynamics along the nominal trajectory (A_t, B_t
via ``jax.jacfwd`` of the env step), expands the soft cost to second
order, and solves the time-varying LQR subproblem with a backward
Riccati sweep — curvature-aware action updates with closed-loop gains,
where plain Adam takes tiny noisy steps.

TPU-native shape: the whole optimisation is ONE compiled program —
``lax.scan`` for the nominal rollout, a vmapped ``jacfwd`` stack for the
linearisation, a reversed ``lax.scan`` for the Riccati recursion, a
vmapped parallel line search (all alphas rolled out simultaneously
instead of a sequential backtrack), and an outer ``lax.scan`` over iLQR
iterations with branchless accept/regularise logic.  vmap over warm
starts on top.  No host round-trips anywhere.

iLQR optimises in ACTION space regardless of ``cfg.rollout_mode``
(that is where dynamics are linearisable); warm starts come from G —
decoded waypoints are bridged through the env family's own controller
(``distill_actions``), decoded actions pass straight through.  The
refined plan is re-expressed in the config's planning representation
(executed positions for waypoint mode, the action sequence itself for
action mode) and the final selection hard-scores the UNION of warm
starts and refined candidates, so the result can only improve on its
own prior draw — the same honesty contract as every other refiner.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ndivplanning_tpu.envs.registry import get_env
from ndivplanning_tpu.envs.rollout import ScoreWeights, distill_actions
from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.planning.grad_refine import SoftWeights
from ndivplanning_tpu.planning.planner import (
    PlanResult,
    _diverse_top_m,
    decode_latents as _decode,
    score_rollouts,
)
from ndivplanning_tpu.train.state import TrainState
from ndivplanning_tpu.utils.config import Config

# Parallel line search: every alpha's closed-loop rollout runs in one
# vmapped program (a sequential backtrack would serialise 5 scans).
# Alpha 0 reproduces the nominal, so the branchless accept below can
# never move to a worse trajectory.
_ALPHAS = (1.0, 0.6, 0.3, 0.1, 0.0)
# No hardcoded action dimension anywhere in this module: ``du`` is read
# off the warm-start action sequences (``u0.shape``), which come from
# ``distill_actions`` through each family's own ``waypoint_control`` —
# a fifth family with a non-2D action space flows through unchanged
# (``envs/registry.py::action_dim`` is the queryable source of truth).


def _state_codec(template):
    """(ravel, unravel, pos_slice, dim) for an env state dataclass.

    Each family carries its own state fields (pointmass pos/vel,
    unicycle pose/speed, reacher joints, quadrotor attitude); iLQR needs
    a flat float vector.  Float leaves ravel in field order; integer
    leaves (the step counter) are held from a donor state — they never
    enter the linearisation."""
    names = [f.name for f in dataclasses.fields(template)]
    leaves = [jnp.asarray(getattr(template, n)) for n in names]
    is_float = [jnp.issubdtype(l.dtype, jnp.floating) for l in leaves]
    offsets = {}
    off = 0
    for n, l, f in zip(names, leaves, is_float):
        if f:
            size = max(int(l.size), 1)
            offsets[n] = (off, off + size)
            off += size
    shapes = {n: l.shape for n, l in zip(names, leaves)}

    def ravel(state):
        return jnp.concatenate([
            jnp.reshape(getattr(state, n), (-1,))
            for n, f in zip(names, is_float) if f])

    def unravel(x, ints_from):
        kw = {}
        for n, f in zip(names, is_float):
            if f:
                lo, hi = offsets[n]
                kw[n] = jnp.reshape(x[lo:hi], shapes[n])
            else:
                kw[n] = getattr(ints_from, n)
        return type(template)(**kw)

    return ravel, unravel, slice(*offsets["pos"]), off


def resolve_ilqr_budget(cfg: Config, n_candidates: int | None = None,
                        n_iters: int | None = None):
    """(n_warm_starts, ilqr_iterations) with config defaults.  iLQR is
    ~an order heavier per candidate than first-order trajopt (each
    iteration linearises H steps and rolls out every line-search alpha),
    so the default warm-start pool is n_candidates/16 where trajopt
    uses /4."""
    n = max(cfg.n_candidates // 16, 2) if n_candidates is None else n_candidates
    return n, (cfg.ilqr_iters if n_iters is None else n_iters)


def _ilqr_refine(cfg: Config, scene: Scene, u0: jnp.ndarray, n_iters: int,
                 soft: SoftWeights, reg0: float):
    """Refine ONE action sequence ``u0 [H, du]``; returns
    ``(u_star, positions [H, 2], cost_curve [n_iters])``."""
    api = get_env(cfg.env)
    params = api.make_params()
    x0 = api.reset(params, scene)
    ravel, unravel, pos_slice, dx = _state_codec(x0)
    h, du = u0.shape

    def step_state(state, u):
        new_state, _ = api.step(params, scene, state, u)
        return new_state

    def rollout(u):
        """(pre-step states x_0..x_{H-1}, post-step states x_1..x_H)."""
        def body(st, ut):
            nst = step_state(st, ut)
            return nst, (st, nst)
        _, (pre, post) = jax.lax.scan(body, x0, u)
        return pre, post

    def stage_cost(x, u):
        pos = x[pos_slice]
        c = scene.obstacles[:, :2]
        r = scene.obstacles[:, 2]
        dist = jnp.sqrt(jnp.sum(jnp.square(pos[None] - c), -1) + 1e-12)
        pen = jax.nn.relu(r + soft.margin - dist)
        # Squared hinge (not the refiner's plain hinge): iLQR consumes
        # the cost HESSIAN, and the squared form has usable curvature
        # where the hinge's is zero a.e.
        return (soft.control * jnp.sum(u * u)
                + soft.obstacle * jnp.sum(scene.obstacle_mask * pen * pen))

    def term_cost(x):
        pos = x[pos_slice]
        # 10x the refiner's goal weight: iLQR uses SQUARED distance (for
        # usable curvature) where the hard score is linear, so at equal
        # weight the control term wins near the goal and the optimum
        # parks just OUTSIDE the goal radius (measured dist 0.053 vs
        # radius 0.05 on the pointmass at 1x).
        return 10.0 * soft.goal * jnp.sum(jnp.square(pos - scene.goal))

    def traj_cost(u):
        pre, post = rollout(u)
        xs = jax.vmap(ravel)(pre)
        last = jax.tree.map(lambda a: a[-1], post)
        return (jnp.sum(jax.vmap(stage_cost)(xs, u))
                + term_cost(ravel(last)))

    def f_vec(x, u, ints_state):
        return ravel(step_state(unravel(x, ints_state), u))

    def iteration(carry, _):
        u_nom, cost_nom, mu = carry
        pre, post = rollout(u_nom)
        xs = jax.vmap(ravel)(pre)  # [H, dx]
        # Linearisation + quadratic cost expansion along the nominal.
        jac_x = jax.vmap(lambda x, u, s: jax.jacfwd(f_vec, 0)(x, u, s))
        jac_u = jax.vmap(lambda x, u, s: jax.jacfwd(f_vec, 1)(x, u, s))
        a_t = jac_x(xs, u_nom, pre)  # [H, dx, dx]
        b_t = jac_u(xs, u_nom, pre)  # [H, dx, du]
        lx = jax.vmap(jax.grad(stage_cost, 0))(xs, u_nom)
        lu = jax.vmap(jax.grad(stage_cost, 1))(xs, u_nom)
        lxx = jax.vmap(jax.hessian(stage_cost, 0))(xs, u_nom)
        luu = jax.vmap(jax.hessian(stage_cost, 1))(xs, u_nom)
        lux = jax.vmap(
            lambda x, u: jax.jacfwd(jax.grad(stage_cost, 1), 0)(x, u)
        )(xs, u_nom)
        x_last = ravel(jax.tree.map(lambda a: a[-1], post))
        vx = jax.grad(term_cost)(x_last)
        vxx = jax.hessian(term_cost)(x_last)

        def riccati(carry, inp):
            vx, vxx = carry
            a, b, lx_t, lu_t, lxx_t, luu_t, lux_t = inp
            qx = lx_t + a.T @ vx
            qu = lu_t + b.T @ vx
            qxx = lxx_t + a.T @ vxx @ a
            quu = luu_t + b.T @ vxx @ b + mu * jnp.eye(du)
            qux = lux_t + b.T @ vxx @ a
            k = -jnp.linalg.solve(quu, qu)
            kk = -jnp.linalg.solve(quu, qux)
            vx_n = qx + kk.T @ quu @ k + kk.T @ qu + qux.T @ k
            vxx_n = qxx + kk.T @ quu @ kk + kk.T @ qux + qux.T @ kk
            return (vx_n, 0.5 * (vxx_n + vxx_n.T)), (k, kk)

        (_, _), (ks, kks) = jax.lax.scan(
            riccati, (vx, vxx), (a_t, b_t, lx, lu, lxx, luu, lux),
            reverse=True)

        def closed_loop(alpha):
            def body(st, inp):
                u_t, x_nom_t, k_t, kk_t = inp
                u = u_t + alpha * k_t + kk_t @ (ravel(st) - x_nom_t)
                return step_state(st, u), u
            _, u_new = jax.lax.scan(body, x0, (u_nom, xs, ks, kks))
            return u_new

        u_cands = jax.vmap(closed_loop)(jnp.asarray(_ALPHAS))
        costs = jax.vmap(traj_cost)(u_cands)
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
        best = jnp.argmin(costs)
        improved = costs[best] < cost_nom - 1e-9
        u_next = jnp.where(improved, u_cands[best], u_nom)
        cost_next = jnp.where(improved, costs[best], cost_nom)
        # Levenberg-style trust region: shrink on progress, grow on a
        # rejected step (branchless — both live under the scan).
        mu = jnp.where(improved, jnp.maximum(mu * 0.5, 1e-6),
                       jnp.minimum(mu * 4.0, 1e6))
        return (u_next, cost_next, mu), cost_next

    cost0 = traj_cost(u0)
    cost0 = jnp.where(jnp.isfinite(cost0), cost0, jnp.inf)
    (u_star, _, _), curve = jax.lax.scan(
        iteration, (u0, cost0, jnp.asarray(reg0, jnp.float32)), None,
        length=n_iters)
    _, post = rollout(u_star)
    return u_star, post.pos, curve  # post.pos: [H, 2] executed positions


def _warm_start_actions(cfg: Config, scene: Scene,
                        taus: jnp.ndarray) -> jnp.ndarray:
    """G's decoded candidates -> action sequences for iLQR: identity in
    action mode; the env family's own controller along the waypoints
    otherwise (the same bridge the action-mode sampler uses)."""
    if cfg.rollout_mode == "actions":
        return taus
    api = get_env(cfg.env)
    params = api.make_params()
    return jax.vmap(
        lambda tau: distill_actions(params, scene, tau, cfg.env))(taus)


def _ilqr_impl(cfg: Config, state: TrainState, scene: Scene,
               condition: jnp.ndarray, key: jax.Array, n: int,
               n_iters: int, soft: SoftWeights, reg0: float,
               n_diverse: int, weights: ScoreWeights, constrain=None):
    # ``constrain``: candidate-axis mesh-layout hook (identity when
    # unsharded) — same contract as trajopt/grad_refine/cem.  Pinning
    # u0's warm-start axis makes the vmapped per-candidate Riccati
    # programs split over the mesh; only the union selection gathers.
    cst = constrain if constrain is not None else (lambda a: a)
    z0 = cst(jax.random.normal(key, (n, cfg.latent_dim)))
    tau0 = cst(_decode(cfg, state, condition, z0))  # G as warm start
    u0 = cst(_warm_start_actions(cfg, scene, tau0))

    u_star, positions, curves = jax.vmap(
        lambda u: _ilqr_refine(cfg, scene, u, n_iters, soft, reg0))(u0)
    tau_ref = u_star if cfg.rollout_mode == "actions" else positions

    # Honest union selection (identical contract to trajopt/grad_refine).
    taus = cst(jnp.concatenate([tau0, tau_ref]))
    results = score_rollouts(cfg, scene, taus, weights)
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
    return plan, jnp.mean(curves, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_candidates", "n_iters", "soft", "reg0", "n_diverse",
    "weights"))
def plan_ilqr(cfg: Config, state: TrainState, scene: Scene,
              condition: jnp.ndarray, key: jax.Array,
              n_candidates: int | None = None, n_iters: int | None = None,
              soft: SoftWeights = SoftWeights(), reg0: float = 1.0,
              n_diverse: int = 8, weights: ScoreWeights = ScoreWeights()):
    """iLQR-refined planning for one scene.

    Returns ``(PlanResult, cost_curve)``; ``cost_curve [n_iters]`` is
    the warm-start-mean soft cost after each iLQR iteration (monotone
    non-increasing per candidate by the alpha-0 line-search guarantee).
    """
    n, iters = resolve_ilqr_budget(cfg, n_candidates, n_iters)
    return _ilqr_impl(cfg, state, scene, condition, key, n, iters, soft,
                      reg0, n_diverse, weights)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "n_candidates", "n_iters", "soft", "reg0", "n_diverse",
    "weights"))
def plan_ilqr_batch(cfg: Config, state: TrainState, scenes: Scene,
                    conditions: jnp.ndarray, keys: jax.Array,
                    n_candidates: int | None = None,
                    n_iters: int | None = None,
                    soft: SoftWeights = SoftWeights(), reg0: float = 1.0,
                    n_diverse: int = 8,
                    weights: ScoreWeights = ScoreWeights()):
    """Batched :func:`plan_ilqr` (vmap over scenes, same program)."""
    n, iters = resolve_ilqr_budget(cfg, n_candidates, n_iters)
    return jax.vmap(
        lambda sc, co, k: _ilqr_impl(cfg, state, sc, co, k, n, iters,
                                     soft, reg0, n_diverse, weights)
    )(scenes, conditions, keys)
