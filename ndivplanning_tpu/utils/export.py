"""Deployment export via ``jax.export`` (SURVEY.md §2 L7 "as-a-service"
shape, BASELINE.json serving surface).

Serializes the two inference surfaces to portable StableHLO artifacts —
trained parameters baked in as constants — so a serving deployment can
run them with NOTHING but jax installed: no model code, no flax, no
checkpoint plumbing.  Artifacts are lowered for BOTH cpu and tpu
platforms and use a symbolic batch dimension, so one export serves any
request batch size on either backend.

Artifact layout (``export_bundle``):

    <out_dir>/generator.stablehlo   (conditions[b,...], z[b,n,zdim]) -> traj[b,n,H,S]
    <out_dir>/planner.stablehlo     (conditions[b,...], start[b,2], goal[b,2],
                                     obstacles[b,M,3], obstacle_mask[b,M],
                                     seeds[b] i32)
                                    -> (best_traj[b,H,S], best_score[b],
                                        best_reached[b], diverse_trajs[b,m,H,S])
    <out_dir>/cem_planner.stablehlo same signature -> same outputs plus
                                    best_curve[b, cem_iters] (the CEM
                                    latent-refinement planner — the
                                    measured-best refiner on the
                                    hard-dynamics quadrotor family)
    <out_dir>/trajopt_planner.stablehlo
                                    same signature -> same outputs plus
                                    loss_curve[b, steps] (direct tau
                                    optimisation — the measured-best
                                    open-loop mode on the shipped
                                    pointmass checkpoint, BASELINE.md r3)
    <out_dir>/mpc_controller.stablehlo
                                    same scene signature -> (positions[b,T,S],
                                    reached[b], collided[b]) — the CLOSED-LOOP
                                    receding-horizon controller (replan-every-
                                    r-steps episode as one scanned program)
    <out_dir>/manifest.json         config + entry signatures

The planner artifact contains the WHOLE sim-in-the-loop pipeline —
candidate generation, vmapped ``lax.scan`` rollouts, scoring, diverse
top-m selection — as one program (SURVEY.md §3.3).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp

from ndivplanning_tpu.utils.config import Config

GENERATOR_FILE = "generator.stablehlo"
PLANNER_FILE = "planner.stablehlo"
CEM_PLANNER_FILE = "cem_planner.stablehlo"
TRAJOPT_PLANNER_FILE = "trajopt_planner.stablehlo"
ILQR_PLANNER_FILE = "ilqr_planner.stablehlo"
MPC_CONTROLLER_FILE = "mpc_controller.stablehlo"
MANIFEST_FILE = "manifest.json"

_PLATFORMS = ("cpu", "tpu")


def _condition_struct(cfg: Config, b):
    """ShapeDtypeStruct of the raw condition input with batch dim ``b``."""
    from ndivplanning_tpu.models.conditioning import condition_input_example

    ex = condition_input_example(cfg.conditioning, batch=1,
                                 image_size=cfg.image_size)
    return jax.ShapeDtypeStruct((b, *ex.shape[1:]), ex.dtype)


def export_generator(cfg: Config, state) -> bytes:
    """Serialize ``G(conditions, z) -> trajectories`` with the (EMA-aware)
    trained weights baked in; batch and sample-count dims are symbolic."""
    from ndivplanning_tpu.train.state import build_models, gen_params

    gen, _ = build_models(cfg)
    params = jax.device_get(gen_params(cfg, state))

    def generate(conditions, z):
        return gen.apply(params, conditions, z)

    b, n = jax.export.symbolic_shape("b, n")
    exp = jax.export.export(jax.jit(generate), platforms=_PLATFORMS)(
        _condition_struct(cfg, b),
        jax.ShapeDtypeStruct((b, n, cfg.latent_dim), jnp.float32),
    )
    return exp.serialize()


def export_planner(cfg: Config, state, n_candidates: int | None = None,
                   n_diverse: int = 8) -> bytes:
    """Serialize the full plan-a-scene-batch pipeline (generate ->
    rollout -> select) as one program over plain arrays.

    The scene arrives as its raw arrays (start/goal/obstacles/mask) so a
    deployment needs no Scene pytree class; PRNG keys are derived inside
    from per-scene int32 seeds.
    """
    from ndivplanning_tpu.envs.types import MAX_OBSTACLES, Scene
    from ndivplanning_tpu.planning.planner import _plan_impl
    from ndivplanning_tpu.envs.rollout import ScoreWeights

    n = cfg.n_candidates if n_candidates is None else n_candidates
    state = jax.device_get(state)
    weights = ScoreWeights()

    def plan_arrays(conditions, start, goal, obstacles, obstacle_mask,
                    seeds):
        def one(cond, s, g, obs, mask, seed):
            scene = Scene(start=s, goal=g, obstacles=obs,
                          obstacle_mask=mask)
            key = jax.random.PRNGKey(seed)
            r = _plan_impl(cfg, state, scene, cond, key, n,
                           n_diverse, weights)
            return r.best_traj, r.best_score, r.best_reached, r.diverse_trajs

        return jax.vmap(one)(conditions, start, goal, obstacles,
                             obstacle_mask, seeds)

    (b,) = jax.export.symbolic_shape("b")
    f32 = jnp.float32
    exp = jax.export.export(jax.jit(plan_arrays), platforms=_PLATFORMS)(
        _condition_struct(cfg, b),
        jax.ShapeDtypeStruct((b, 2), f32),
        jax.ShapeDtypeStruct((b, 2), f32),
        jax.ShapeDtypeStruct((b, MAX_OBSTACLES, 3), f32),
        jax.ShapeDtypeStruct((b, MAX_OBSTACLES), f32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    return exp.serialize()


def export_cem_planner(cfg: Config, state, n_candidates: int | None = None,
                       n_iters: int | None = None,
                       n_diverse: int = 8) -> bytes:
    """Serialize the CEM latent-refinement planner (planning/cem.py) —
    the measured-best refiner on the hard-dynamics quadrotor family, and
    goal-reach 0.938 vs 0.906 one-shot on the planning preset in round
    2 (since superseded there by trajopt — BASELINE.md r3j) — as one
    StableHLO program.

    The refinement is a ``lax.scan`` over elite-refit iterations on top
    of the vmapped rollout scorer, so it exports exactly like the
    one-shot planner; same raw-array scene signature plus a
    ``best_curve[b, iters]`` output (the per-iteration best-so-far score,
    monotone non-increasing — deployments can assert refinement health).
    ``n_candidates`` semantics MATCH ``plan_cem`` exactly (an exported
    artifact must agree with the live planner at the same argument): an
    explicit value is the PER-ITERATION population; the ``None`` default
    splits ``cfg.n_candidates`` across iterations (equal total rollout
    budget to one-shot planning).  Elite = 10% of the population (>= 2).
    """
    from ndivplanning_tpu.envs.rollout import ScoreWeights
    from ndivplanning_tpu.envs.types import MAX_OBSTACLES, Scene
    from ndivplanning_tpu.planning.cem import _cem_impl, cem_population

    n, elite, iters = cem_population(cfg, n_candidates, n_iters)
    state = jax.device_get(state)
    weights = ScoreWeights()

    def plan_arrays(conditions, start, goal, obstacles, obstacle_mask,
                    seeds):
        def one(cond, s, g, obs, mask, seed):
            scene = Scene(start=s, goal=g, obstacles=obs,
                          obstacle_mask=mask)
            key = jax.random.PRNGKey(seed)
            r, curve = _cem_impl(cfg, state, scene, cond, key, n, elite,
                                 iters, 0.25, 0.05, n_diverse, weights)
            return (r.best_traj, r.best_score, r.best_reached,
                    r.diverse_trajs, curve)

        return jax.vmap(one)(conditions, start, goal, obstacles,
                             obstacle_mask, seeds)

    (b,) = jax.export.symbolic_shape("b")
    f32 = jnp.float32
    exp = jax.export.export(jax.jit(plan_arrays), platforms=_PLATFORMS)(
        _condition_struct(cfg, b),
        jax.ShapeDtypeStruct((b, 2), f32),
        jax.ShapeDtypeStruct((b, 2), f32),
        jax.ShapeDtypeStruct((b, MAX_OBSTACLES, 3), f32),
        jax.ShapeDtypeStruct((b, MAX_OBSTACLES), f32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    return exp.serialize()


def export_trajopt_planner(cfg: Config, state,
                           n_candidates: int | None = None,
                           n_steps: int | None = None,
                           lr: float | None = None,
                           n_diverse: int = 8) -> bytes:
    """Serialize the direct trajectory-optimisation planner
    (planning/trajopt.py — the measured-best open-loop planning mode on
    the shipped pointmass checkpoint: mean best score 0.076 vs 0.172
    one-shot at suite scale, BASELINE.md round 3) as one StableHLO
    program: warm-start decode, ``lax.scan`` of in-jit Adam steps
    through the differentiable rollout, hard-scored union selection.
    Defaults MATCH ``plan_trajopt`` (n = cfg.n_candidates/4,
    cfg.trajopt_steps Adam steps at cfg.trajopt_lr); same raw-array
    scene signature plus a ``loss_curve[b, steps]`` output.
    """
    from ndivplanning_tpu.envs.rollout import ScoreWeights
    from ndivplanning_tpu.envs.types import MAX_OBSTACLES, Scene
    from ndivplanning_tpu.planning.grad_refine import SoftWeights
    from ndivplanning_tpu.planning.trajopt import (
        _trajopt_impl,
        resolve_budget,
    )

    n, steps, lr = resolve_budget(cfg, n_candidates, n_steps, lr)
    state = jax.device_get(state)
    weights = ScoreWeights()
    soft = SoftWeights()

    def plan_arrays(conditions, start, goal, obstacles, obstacle_mask,
                    seeds):
        def one(cond, s, g, obs, mask, seed):
            scene = Scene(start=s, goal=g, obstacles=obs,
                          obstacle_mask=mask)
            key = jax.random.PRNGKey(seed)
            r, curve = _trajopt_impl(cfg, state, scene, cond, key, n,
                                     steps, lr, soft, n_diverse, weights)
            return (r.best_traj, r.best_score, r.best_reached,
                    r.diverse_trajs, curve)

        return jax.vmap(one)(conditions, start, goal, obstacles,
                             obstacle_mask, seeds)

    (b,) = jax.export.symbolic_shape("b")
    f32 = jnp.float32
    exp = jax.export.export(jax.jit(plan_arrays), platforms=_PLATFORMS)(
        _condition_struct(cfg, b),
        jax.ShapeDtypeStruct((b, 2), f32),
        jax.ShapeDtypeStruct((b, 2), f32),
        jax.ShapeDtypeStruct((b, MAX_OBSTACLES, 3), f32),
        jax.ShapeDtypeStruct((b, MAX_OBSTACLES), f32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    return exp.serialize()


def export_ilqr_planner(cfg: Config, state,
                        n_candidates: int | None = None,
                        n_iters: int | None = None,
                        n_diverse: int = 8) -> bytes:
    """Serialize the iLQR planner (planning/ilqr.py — the measured-best
    open-loop mode on the underactuated quadrotor at ilqr_iters=36,
    BASELINE.md round 4) as one StableHLO program: warm-start decode,
    per-candidate linearise -> Riccati backward sweep -> parallel line
    search under an outer ``lax.scan``, hard-scored union selection.
    Defaults MATCH ``plan_ilqr`` (n = cfg.n_candidates/16,
    cfg.ilqr_iters iterations); same raw-array scene signature plus a
    ``cost_curve[b, iters]`` output.
    """
    from ndivplanning_tpu.envs.rollout import ScoreWeights
    from ndivplanning_tpu.envs.types import MAX_OBSTACLES, Scene
    from ndivplanning_tpu.planning.grad_refine import SoftWeights
    from ndivplanning_tpu.planning.ilqr import (
        _ilqr_impl,
        resolve_ilqr_budget,
    )

    n, iters = resolve_ilqr_budget(cfg, n_candidates, n_iters)
    state = jax.device_get(state)
    weights = ScoreWeights()
    soft = SoftWeights()

    def plan_arrays(conditions, start, goal, obstacles, obstacle_mask,
                    seeds):
        def one(cond, s, g, obs, mask, seed):
            scene = Scene(start=s, goal=g, obstacles=obs,
                          obstacle_mask=mask)
            key = jax.random.PRNGKey(seed)
            r, curve = _ilqr_impl(cfg, state, scene, cond, key, n, iters,
                                  soft, 1.0, n_diverse, weights)
            return (r.best_traj, r.best_score, r.best_reached,
                    r.diverse_trajs, curve)

        return jax.vmap(one)(conditions, start, goal, obstacles,
                             obstacle_mask, seeds)

    (b,) = jax.export.symbolic_shape("b")
    f32 = jnp.float32
    exp = jax.export.export(jax.jit(plan_arrays), platforms=_PLATFORMS)(
        _condition_struct(cfg, b),
        jax.ShapeDtypeStruct((b, 2), f32),
        jax.ShapeDtypeStruct((b, 2), f32),
        jax.ShapeDtypeStruct((b, MAX_OBSTACLES, 3), f32),
        jax.ShapeDtypeStruct((b, MAX_OBSTACLES), f32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    return exp.serialize()


def export_mpc_controller(cfg: Config, state, total_steps: int = 64,
                          replan_every: int = 8,
                          n_candidates: int = 256) -> bytes:
    """Serialize the closed-loop MPC controller (planning/mpc.py
    ``mpc_rollout_batch`` — the measured-best execution mode: closed-loop
    success 1.00 vs 0.95 open-loop, BASELINE.md) as one StableHLO
    program: a ``lax.scan`` over replanning cycles, each cycle =
    generate candidates from the LIVE state -> score -> execute the next
    ``replan_every`` waypoints, vmapped over scenes.

    Same raw-array scene signature as the planner artifacts; returns
    ``(positions[b, total_steps, S], reached[b], collided[b])``.  The
    cycle parameters are baked in (they are static under jit for the
    live path too) and recorded in the bundle manifest.
    """
    from ndivplanning_tpu.envs.rollout import ScoreWeights
    from ndivplanning_tpu.envs.types import MAX_OBSTACLES, Scene
    from ndivplanning_tpu.planning.mpc import _episode_fused

    state = jax.device_get(state)
    weights = ScoreWeights()

    def run_arrays(conditions, start, goal, obstacles, obstacle_mask,
                   seeds):
        def one(cond, s, g, obs, mask, seed):
            scene = Scene(start=s, goal=g, obstacles=obs,
                          obstacle_mask=mask)
            key = jax.random.PRNGKey(seed)
            r = _episode_fused(cfg, state, scene, cond, key, total_steps,
                               replan_every, n_candidates, weights)
            return r.positions, r.reached, r.collided

        return jax.vmap(one)(conditions, start, goal, obstacles,
                             obstacle_mask, seeds)

    (b,) = jax.export.symbolic_shape("b")
    f32 = jnp.float32
    exp = jax.export.export(jax.jit(run_arrays), platforms=_PLATFORMS)(
        _condition_struct(cfg, b),
        jax.ShapeDtypeStruct((b, 2), f32),
        jax.ShapeDtypeStruct((b, 2), f32),
        jax.ShapeDtypeStruct((b, MAX_OBSTACLES, 3), f32),
        jax.ShapeDtypeStruct((b, MAX_OBSTACLES), f32),
        jax.ShapeDtypeStruct((b,), jnp.int32),
    )
    return exp.serialize()


def export_bundle(cfg: Config, state, out_dir: str,
                  n_candidates: int | None = None,
                  n_diverse: int = 8,
                  mpc_total_steps: int = 64,
                  mpc_replan_every: int = 8,
                  mpc_candidates: int = 256) -> dict:
    """Write generator + planner artifacts and a manifest to ``out_dir``.

    Returns the manifest dict (artifact names, sizes, config).
    """
    from ndivplanning_tpu.planning.cem import cem_population
    from ndivplanning_tpu.planning.ilqr import resolve_ilqr_budget
    from ndivplanning_tpu.planning.trajopt import resolve_budget

    _trj_budget = resolve_budget(cfg, n_candidates)
    _ilqr_budget = resolve_ilqr_budget(cfg, n_candidates)
    os.makedirs(out_dir, exist_ok=True)
    gen_blob = export_generator(cfg, state)
    plan_blob = export_planner(cfg, state, n_candidates=n_candidates,
                               n_diverse=n_diverse)
    cem_blob = export_cem_planner(cfg, state, n_candidates=n_candidates,
                                  n_diverse=n_diverse)
    trajopt_blob = export_trajopt_planner(cfg, state,
                                          n_candidates=n_candidates,
                                          n_diverse=n_diverse)
    ilqr_blob = export_ilqr_planner(cfg, state, n_candidates=n_candidates,
                                    n_diverse=n_diverse)
    mpc_blob = export_mpc_controller(cfg, state,
                                     total_steps=mpc_total_steps,
                                     replan_every=mpc_replan_every,
                                     n_candidates=mpc_candidates)
    with open(os.path.join(out_dir, GENERATOR_FILE), "wb") as f:
        f.write(gen_blob)
    with open(os.path.join(out_dir, PLANNER_FILE), "wb") as f:
        f.write(plan_blob)
    with open(os.path.join(out_dir, CEM_PLANNER_FILE), "wb") as f:
        f.write(cem_blob)
    with open(os.path.join(out_dir, TRAJOPT_PLANNER_FILE), "wb") as f:
        f.write(trajopt_blob)
    with open(os.path.join(out_dir, ILQR_PLANNER_FILE), "wb") as f:
        f.write(ilqr_blob)
    with open(os.path.join(out_dir, MPC_CONTROLLER_FILE), "wb") as f:
        f.write(mpc_blob)
    manifest = {
        "config": dataclasses.asdict(cfg),
        "step": int(jax.device_get(state.step)),
        "platforms": list(_PLATFORMS),
        "generator": {
            "file": GENERATOR_FILE,
            "bytes": len(gen_blob),
            "signature": "(conditions[b,...], z[b,n,zdim]) -> traj[b,n,H,S]",
        },
        "planner": {
            "file": PLANNER_FILE,
            "bytes": len(plan_blob),
            "n_candidates": (cfg.n_candidates if n_candidates is None
                             else n_candidates),
            "n_diverse": n_diverse,
            "signature": "(conditions, start, goal, obstacles, "
                         "obstacle_mask, seeds) -> (best_traj, best_score,"
                         " best_reached, diverse_trajs)",
        },
        "cem_planner": {
            "file": CEM_PLANNER_FILE,
            "bytes": len(cem_blob),
            # The population actually baked into the artifact (per
            # iteration, plan_cem semantics) — not the ambiguous input.
            "population": cem_population(cfg, n_candidates)[0],
            "cem_iters": cfg.cem_iters,
            "n_diverse": n_diverse,
            "signature": "(conditions, start, goal, obstacles, "
                         "obstacle_mask, seeds) -> (best_traj, best_score,"
                         " best_reached, diverse_trajs, best_curve)",
        },
        "trajopt_planner": {
            "file": TRAJOPT_PLANNER_FILE,
            "bytes": len(trajopt_blob),
            # The budget actually baked into the artifact.
            "n_warm_starts": _trj_budget[0],
            "adam_steps": _trj_budget[1],
            "lr": _trj_budget[2],
            "n_diverse": n_diverse,
            "signature": "(conditions, start, goal, obstacles, "
                         "obstacle_mask, seeds) -> (best_traj, best_score,"
                         " best_reached, diverse_trajs, loss_curve)",
        },
        "ilqr_planner": {
            "file": ILQR_PLANNER_FILE,
            "bytes": len(ilqr_blob),
            # The budget actually baked into the artifact.
            "n_warm_starts": _ilqr_budget[0],
            "ilqr_iters": _ilqr_budget[1],
            "n_diverse": n_diverse,
            "signature": "(conditions, start, goal, obstacles, "
                         "obstacle_mask, seeds) -> (best_traj, best_score,"
                         " best_reached, diverse_trajs, cost_curve)",
        },
        "mpc_controller": {
            "file": MPC_CONTROLLER_FILE,
            "bytes": len(mpc_blob),
            "total_steps": mpc_total_steps,
            "replan_every": mpc_replan_every,
            "n_candidates": mpc_candidates,
            "signature": "(conditions, start, goal, obstacles, "
                         "obstacle_mask, seeds) -> (positions[b,T,S], "
                         "reached[b], collided[b])",
        },
    }
    with open(os.path.join(out_dir, MANIFEST_FILE), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def load_exported(path: str):
    """Deserialize one artifact; returns a callable (the Exported's
    ``call``), runnable under jit on any of the lowered platforms."""
    with open(path, "rb") as f:
        return jax.export.deserialize(f.read()).call
