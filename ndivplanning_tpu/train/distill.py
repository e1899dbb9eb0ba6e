"""Expert iteration: distill the closed-loop planner back into G.

Round-3 measured the teacher without using it: closed-loop MPC scores
1.000 at suite scale on EVERY dynamics family while the one-shot
generator sits at 0.26-0.31 per-draw on the quadrotor and ~0.75-0.83 on
the image-conditioned presets (BASELINE.md r3n).  Every piece existed —
``mpc_rollout_batch``, the recorded-dataset npz format, and
``train_from_dataset`` — but nothing closed the loop.  This module does:

1. :func:`record_planner_dataset` runs the batched closed-loop planner
   (MPC; or open-loop trajopt on kinematic families) over freshly
   sampled scenes, re-verifies every recorded trajectory OPEN-LOOP
   against its true scene, and records the survivors as expert data in
   the exact npz schema ``record_dataset`` writes (conditions +
   real_traj + scene ground truth).
2. :func:`expert_iteration` alternates record -> GAN fine-tune
   (``train_from_dataset``) -> frozen-suite eval, keeping a round's
   result only when the tracked metric improves (monotone by
   construction — a degrading round is reported, not kept).

The open-loop re-verification is the honesty core: an MPC episode
succeeds under feedback, but its executed positions re-played as a
waypoint plan may not (that gap IS the quadrotor problem).  Training
targets are therefore only trajectories that demonstrably succeed when
executed the way the generator's outputs are executed
(``cfg.rollout_mode`` against the TRUE scene).

TPU shape notes: recording dispatches in ``scene_chunk`` batches (a
single device execution much past ~1 min crashes the axon worker —
CLAUDE.md round 3); MPC records at ``total_steps = cfg.horizon`` by
default so executed positions are one-to-one with waypoint slots (the
rollout engine runs exactly one env step per waypoint, envs/rollout.py).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.train.state import TrainState, create_train_state
from ndivplanning_tpu.utils.config import Config

# Default scene seed for expert recording — distinct from the frozen
# eval suite's EVAL_SUITE_SEED (train/evaluate.py): recording on suite
# scenes would train the generator on its own test set.
RECORD_SEED = 0xD157


@functools.partial(jax.jit, static_argnames=("cfg",))
def _verify_open_loop(cfg: Config, scenes, trajs: jnp.ndarray):
    """(reached, collided) of ``trajs [B, H, S]`` executed open-loop in
    ``cfg.rollout_mode`` against their TRUE scenes — the filter that
    makes recorded data honest training targets."""
    from ndivplanning_tpu.envs.registry import get_env
    from ndivplanning_tpu.envs.rollout import ScoreWeights, _rollout_scan

    params = get_env(cfg.env).make_params()

    def one(scene, tau):
        r = _rollout_scan(params, scene, tau, cfg.rollout_mode,
                          ScoreWeights(), env=cfg.env)
        return r.reached, r.collided

    return jax.vmap(one)(scenes, trajs)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _distill_actions_batch(cfg: Config, scenes, waypoints: jnp.ndarray):
    """Waypoint paths -> the env family's expert ACTION sequences, batched
    (envs/rollout.py::distill_actions) — the action-mode recording bridge,
    same construction as the synthetic sampler's ``_actionize``."""
    from ndivplanning_tpu.envs.registry import get_env
    from ndivplanning_tpu.envs.rollout import distill_actions

    params = get_env(cfg.env).make_params()
    return jax.vmap(
        lambda sc, w: distill_actions(params, sc, w, cfg.env)
    )(scenes, waypoints)


def _subsample_to_horizon(positions: np.ndarray, horizon: int) -> np.ndarray:
    """[B, T, P] executed positions -> [B, H, P] waypoint slots.

    Identity when T == H.  Otherwise takes the positions reached at the
    waypoint time grid ((i+1)/H of the episode) — matching the rollout
    engine's one-env-step-per-waypoint semantics."""
    t = positions.shape[1]
    if t == horizon:
        return positions
    if t < horizon:
        # idx[0] would be -1 (numpy wrap: the FINAL position lands in
        # the first waypoint slot) — corrupt expert data, so refuse.
        raise ValueError(
            f"recorded episodes have {t} steps but the waypoint grid "
            f"needs >= horizon={horizon}; raise total_steps")
    idx = ((np.arange(horizon) + 1) * t) // horizon - 1
    return positions[:, idx, :]


def _plan_expert_chunk(cfg: Config, state: TrainState, scenes, conditions,
                       keys, *, planner: str, total_steps: int,
                       replan_every: int, n_candidates: int) -> np.ndarray:
    """One recording dispatch: [chunk, H, S] candidate expert
    trajectories (waypoint positions; action distillation happens in the
    caller so MPC and trajopt share it)."""
    if planner == "mpc":
        from ndivplanning_tpu.planning.mpc import mpc_rollout_batch

        # In action mode the proposal/scoring path is already
        # action-space; the executed POSITIONS are still what we record
        # (then re-distill to actions below) — dynamically consistent by
        # construction either way.
        res = mpc_rollout_batch(cfg, state, scenes, conditions, keys,
                                total_steps=total_steps,
                                replan_every=replan_every,
                                n_candidates=n_candidates)
        pos = np.asarray(jax.device_get(res.positions))
        return _subsample_to_horizon(pos, cfg.horizon)
    if planner == "trajopt":
        from ndivplanning_tpu.planning.trajopt import plan_trajopt_batch

        plan, _ = plan_trajopt_batch(cfg, state, scenes, conditions, keys,
                                     n_candidates=n_candidates)
        return np.asarray(jax.device_get(plan.best_traj))  # [B, H, S]
    if planner == "ilqr":
        # The second-order teacher (round 4): iLQR's optima are SMOOTH
        # dynamically-consistent paths, where the MPC teacher's executed
        # positions are jagged replanned trajectories — measured
        # open-loop keep rate on the quadrotor: MPC 0.21-0.23 vs iLQR's
        # (see benchmarks/distill_quadrotor_ilqr.json).
        from ndivplanning_tpu.planning.ilqr import plan_ilqr_batch

        plan, _ = plan_ilqr_batch(cfg, state, scenes, conditions, keys,
                                  n_candidates=max(n_candidates // 16, 2))
        return np.asarray(jax.device_get(plan.best_traj))
    if planner == "cem+trajopt":
        from ndivplanning_tpu.planning.trajopt import plan_cem_trajopt_batch

        plan, _ = plan_cem_trajopt_batch(cfg, state, scenes, conditions,
                                         keys)
        return np.asarray(jax.device_get(plan.best_traj))
    if planner == "oneshot":
        # Self-distillation teacher (round 5, VERDICT r4 #5): the plain
        # 1000-draw best-of-population planner over the CURRENT
        # generator.  No refinement — the teacher's only edge over the
        # student is selection (best of n_candidates) plus the caller's
        # open-loop verification filter.  Use case: distill a frozen
        # best-of-both checkpoint's verified successes into a fresh or
        # late-collapsed student without the adversarial game.
        from ndivplanning_tpu.planning.planner import plan_batch

        plan = plan_batch(cfg, state, scenes, conditions, keys,
                          n_candidates=n_candidates)
        return np.asarray(jax.device_get(plan.best_traj))
    raise ValueError(f"unknown planner {planner!r}; choose from "
                     "['mpc', 'trajopt', 'ilqr', 'cem+trajopt', 'oneshot']")


def record_planner_dataset(cfg: Config, state: TrainState, n_scenes: int,
                           path: str, *, planner: str = "mpc",
                           seed: int = RECORD_SEED, per_scene: int = 1,
                           total_steps: Optional[int] = None,
                           replan_every: int = 8, n_candidates: int = 256,
                           scene_chunk: int = 128,
                           success_only: bool = True) -> dict:
    """Record planner-generated expert trajectories to ``path`` (npz).

    Scenes come from the preset's own task sampler at ``seed`` (NOT the
    frozen eval suite's seed); each scene is planned ``per_scene`` times
    with independent keys (diverse expert draws — different candidate
    sets land in different homotopy basins).  Every recorded trajectory
    is re-executed OPEN-LOOP against its true scene and, with
    ``success_only``, kept only if it reached collision-free.

    Returns stats: kept/dropped, the open-loop keep rate (the
    feasibility gap diagnostic — for MPC experts this measures how much
    of the closed-loop teacher's skill survives open-loop replay), and
    the echo of the recording parameters.
    """
    from ndivplanning_tpu.data.tasks import make_task

    if planner == "mpc":
        total = cfg.horizon if total_steps is None else total_steps
        if total % replan_every:
            raise ValueError(
                f"mpc recording needs total_steps % replan_every == 0, "
                f"got {total} % {replan_every}")
    else:
        total = total_steps or cfg.horizon

    task = make_task(cfg)
    batch = task.sample(jax.random.PRNGKey(seed), n_scenes)
    scenes_np = jax.tree.map(np.asarray, batch.scenes)
    conds_np = np.asarray(batch.conditions)

    # per_scene independent expert draws: tile rows, split keys.
    if per_scene > 1:
        rep = lambda a: np.repeat(a, per_scene, axis=0)
        scenes_np = jax.tree.map(rep, scenes_np)
        conds_np = rep(conds_np)
    n_rows = n_scenes * per_scene
    keys = jax.random.split(jax.random.PRNGKey(seed + 1), n_rows)

    trajs_parts, reached_parts, collided_parts = [], [], []
    for lo in range(0, n_rows, scene_chunk):
        hi = min(lo + scene_chunk, n_rows)
        sl = slice(lo, hi)
        sc = jax.tree.map(lambda a: jnp.asarray(a[sl]), scenes_np)
        co = jnp.asarray(conds_np[sl])
        tau = _plan_expert_chunk(
            cfg, state, sc, co, keys[sl], planner=planner,
            total_steps=total, replan_every=replan_every,
            n_candidates=n_candidates)
        if cfg.rollout_mode == "actions" and planner == "mpc":
            tau = np.asarray(jax.device_get(
                _distill_actions_batch(cfg, sc, jnp.asarray(tau))))
        r, c = jax.device_get(_verify_open_loop(cfg, sc, jnp.asarray(tau)))
        trajs_parts.append(np.asarray(tau, np.float32))
        reached_parts.append(np.asarray(r))
        collided_parts.append(np.asarray(c))

    trajs = np.concatenate(trajs_parts)
    reached = np.concatenate(reached_parts)
    collided = np.concatenate(collided_parts)
    ok = (reached > 0.5) & (collided < 0.5)
    keep = ok if success_only else np.ones(n_rows, bool)

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        conditions=conds_np[keep].astype(np.float32),
        real_traj=trajs[keep],
        scene_start=np.asarray(scenes_np.start, np.float32)[keep],
        scene_goal=np.asarray(scenes_np.goal, np.float32)[keep],
        scene_obstacles=np.asarray(scenes_np.obstacles, np.float32)[keep],
        scene_obstacle_mask=np.asarray(scenes_np.obstacle_mask,
                                       np.float32)[keep],
    )
    return {
        "planner": planner,
        "n_scenes": int(n_scenes),
        "per_scene": int(per_scene),
        "kept": int(keep.sum()),
        "dropped": int((~keep).sum()),
        "open_loop_keep_rate": float(ok.mean()),
        "total_steps": int(total),
        "replan_every": int(replan_every) if planner == "mpc" else None,
        "n_candidates": int(n_candidates),
        "seed": int(seed),
        "path": path,
    }


def reset_for_finetune(cfg: Config, state: TrainState) -> TrainState:
    """A checkpointed state re-based for a dataset fine-tune: step back
    to 0 (``train_from_dataset`` reads step as a position in the NEW
    dataset's batch order), fresh Adam chains and LeCam trackers, params
    (raw + EMA) and PRNG carried over AS COPIES.

    The copies are load-bearing, not defensive style: the fine-tune's
    chunk step DONATES its state, so an aliased leaf would delete the
    CALLER's buffers too — when a round is rejected, the next round
    records from the original state, and with aliasing that state's
    params are gone (the round-2 donation gotcha again; through the
    axon tunnel it surfaced as an async INVALID_ARGUMENT at the next
    device_get, which masqueraded as a worker flake for two attempts).
    """
    from ndivplanning_tpu.train.state import (
        build_optimizers,
        fresh_ada,
        fresh_lecam_ema,
    )

    g_tx, d_tx = build_optimizers(cfg)
    g_params = jax.tree.map(jnp.copy, state.g_params)
    d_params = jax.tree.map(jnp.copy, state.d_params)
    return state.replace(
        step=jnp.asarray(0, jnp.int32),
        rng=jnp.copy(state.rng),
        g_params=g_params,
        d_params=d_params,
        g_ema_params=jax.tree.map(jnp.copy, state.g_ema_params),
        g_opt_state=g_tx.init(g_params),
        d_opt_state=d_tx.init(d_params),
        lecam_ema=fresh_lecam_ema(),
        ada=fresh_ada(),
    )


def _suite_metrics(cfg: Config, state: TrainState, n_scenes: int,
                   planner_track: Optional[str] = None) -> dict:
    from ndivplanning_tpu.train.evaluate import evaluate_fixed

    out = {k: float(v) for k, v in
           evaluate_fixed(cfg, state, n_scenes=n_scenes).items()}
    if planner_track:
        # Score-axis adjudication (round 5, VERDICT r4 #3): on the
        # kinematic families per-draw success sits at its ~0.98-1.0
        # ceiling, so "did distillation work" is invisible to
        # eval_success_rate — the quantity trajopt-60 moves is the
        # suite's mean BEST planner score (4.1-6.4x better than
        # one-shot, trajopt_results_families.json).  Merge the open-loop
        # one-shot ladder protocol so expert_iteration can track it.
        from ndivplanning_tpu.train.evaluate import evaluate_fixed_planner

        pm = evaluate_fixed_planner(cfg, state, planner=planner_track,
                                    n_scenes=n_scenes)
        out.update({k: v for k, v in pm.items() if not isinstance(v, str)})
    return out


def expert_iteration(cfg: Config, state: Optional[TrainState] = None, *,
                     rounds: int = 1, scenes_per_round: int = 2048,
                     per_scene: int = 1, epochs: Optional[int] = None,
                     planner: str = "mpc", replan_every: int = 8,
                     total_steps: Optional[int] = None,
                     n_candidates: int = 256, scene_chunk: int = 128,
                     workdir: Optional[str] = None, seed: int = RECORD_SEED,
                     suite_scenes: int = 512, echo: bool = False,
                     min_diversity_frac: float = 0.5,
                     track: Optional[str] = None):
    """Iterated distillation: record planner successes -> GAN fine-tune
    on them -> frozen-suite eval; keep a round only if the tracked
    metric improves (monotone expert iteration).

    ``epochs=None`` sizes each fine-tune to ~5000 optimizer steps over
    the recorded dataset.  Returns ``(state, report)`` where report is a
    list of per-round dicts (record stats, before/after frozen-suite
    metrics, accepted flag).  ``suite_scenes`` controls the
    before/after measurement (512 = the standard frozen protocol).

    ``min_diversity_frac`` guards the OTHER half of the contract:
    the quadrotor round-4 study measured a round "win" (+0.018 success)
    whose eval_ndiv had collapsed 36x and mean pairwise distance halved
    — a distilled generator that lost its multimodality is not an
    improvement for a diverse planner.  A round is accepted only if
    eval_mean_pairwise_dist stays >= this fraction of the PRE-ITERATION
    value (0 disables).  The mitigation for tripping it is per_scene > 1
    (diverse expert draws per condition keep the target conditional
    distribution multimodal).
    """
    from ndivplanning_tpu.data.host_pipeline import ArrayDataset
    from ndivplanning_tpu.train.loop import train_from_dataset
    from ndivplanning_tpu.utils import checkpoint as ckpt

    if state is None:
        state = create_train_state(cfg)
    track = track or cfg.track_best_metric or "eval_success_rate"
    # Tracking a planner-ladder metric (eval_plan_*) needs the planner
    # suite eval merged into every before/after measurement; the ladder
    # metric tracked is the ONE-SHOT score — the student's own serving
    # mode — regardless of which (stronger) planner teaches.
    planner_track = "oneshot" if track.startswith("eval_plan_") else None
    workdir = workdir or os.path.join(cfg.workdir or "/tmp/ndivplanning_tpu",
                                      "distill")
    import json
    import shutil

    report = []
    before = _suite_metrics(cfg, state, suite_scenes, planner_track)
    best_val = before.get(track)
    # The diversity floor anchors at the PRE-ITERATION model: later
    # accepted rounds must each still clear it (no ratcheting down).
    div_floor = (min_diversity_frac
                 * before.get("eval_mean_pairwise_dist", 0.0))
    for r in range(rounds):
        round_dir = os.path.join(workdir, f"round_{r}")
        npz = os.path.join(round_dir, "expert.npz")
        # Crash-resume at ROUND granularity: a finished round leaves
        # report_row.json, and an accepted round's state is exactly its
        # <round_dir>/best checkpoint — a re-run (the chip queues retry
        # whole legs after worker flaps) skips straight past it instead
        # of re-paying ~20 min of recording + fine-tune.
        row_path = os.path.join(round_dir, "report_row.json")
        if os.path.exists(row_path):
            with open(row_path, encoding="utf-8") as f:
                row = json.load(f)
            report.append(row)
            if row.get("accepted"):
                from ndivplanning_tpu.utils import checkpoint as _ckpt

                best = _ckpt.restore_latest(
                    os.path.join(round_dir, "best"), state)
                if best is None:
                    # Silently continuing would record round r+1 from
                    # the PRE-round state while the report claims this
                    # round's lift — an internally inconsistent resume.
                    raise RuntimeError(
                        f"resume: round {r} is marked accepted but its "
                        f"best checkpoint under {round_dir} failed to "
                        "restore; delete report_row.json to re-run it")
                state = best
                before = row["after"]
                best_val = row["after"].get(track)
            continue
        rec_path = os.path.join(round_dir, "record.json")
        # A recording is reusable only if it was made with THIS
        # invocation's parameters: the echo in record.json is the
        # provenance check (a re-run with a changed planner/seed/scene
        # count would otherwise silently fine-tune on stale data —
        # ADVICE r4).  total_steps is normalised inside
        # record_planner_dataset, so compare the raw request fields.
        reuse = False
        if os.path.exists(rec_path) and os.path.exists(npz):
            with open(rec_path, encoding="utf-8") as f:
                stats = json.load(f)
            want = {"planner": planner, "n_scenes": int(scenes_per_round),
                    "per_scene": int(per_scene), "seed": int(seed + r),
                    "n_candidates": int(n_candidates)}
            stale = {k: (stats.get(k), v) for k, v in want.items()
                     if stats.get(k) != v}
            if stale:
                if echo:
                    print(f"[distill] round {r}: recorded dataset is "
                          f"stale ({stale}); re-recording")
            else:
                reuse = True
        if not reuse:
            stats = record_planner_dataset(
                cfg, state, scenes_per_round, npz, planner=planner,
                seed=seed + r, per_scene=per_scene,
                total_steps=total_steps, replan_every=replan_every,
                n_candidates=n_candidates, scene_chunk=scene_chunk)
            with open(rec_path, "w", encoding="utf-8") as f:
                json.dump(stats, f)
        # A crashed attempt can leave a stale <round_dir>/best whose
        # marker metric the fresh fine-tune's tracker could never beat
        # — wipe it; this round's fine-tune owns the directory.
        shutil.rmtree(os.path.join(round_dir, "best"),
                      ignore_errors=True)
        row = {"round": r, "record": stats, "before": before}
        if stats["kept"] == 0:
            row.update({"accepted": False,
                        "error": "planner recorded zero successes"})
            with open(row_path, "w", encoding="utf-8") as f:
                json.dump(row, f)
            report.append(row)
            continue
        ds = ArrayDataset.from_npz(npz)
        cfg_ft = cfg
        if ds.size < cfg.batch_size:
            # A heavily filtered recording can undershoot the training
            # batch; shrink rather than refuse (reported in the row).
            cfg_ft = cfg.replace(batch_size=ds.size)
            row["batch_size"] = ds.size
        steps_per_epoch = max(ds.size // cfg_ft.batch_size, 1)
        n_epochs = epochs if epochs is not None else max(
            -(-5000 // steps_per_epoch), 1)
        row["epochs"] = n_epochs
        # Fine-grained eval cadence for the fine-tune: the recorded
        # config of a long soak carries eval_every in the thousands, so
        # best-of-both could only ever see the END state — but a GAN
        # fine-tune on a small expert set peaks EARLY and then
        # memorises/collapses (measured: planning512 round-0 ended at
        # success 0.655 / diversity 0.04 from 0.833 / 0.56).  ~20 eval
        # points let the tracker catch the sweet spot before collapse.
        n_steps = n_epochs * steps_per_epoch
        cadence = max(n_steps // 20, 1)
        # The fine-tune's OWN best tracker also enforces the diversity
        # floor (config.py best_min_diversity): without it the tracker
        # would always prefer the late collapsed high-success state and
        # the round guard below could only reject the whole round —
        # with it, the round's candidate is the best HEALTHY point.
        cfg_ft = cfg_ft.replace(eval_every=cadence, log_every=cadence,
                                best_min_diversity=div_floor)
        ft = reset_for_finetune(cfg_ft, state)
        ft, _ = train_from_dataset(cfg_ft, ds, num_epochs=n_epochs,
                                   state=ft, workdir=round_dir,
                                   restore=False, echo=echo,
                                   eval_suite=True)
        # The fine-tune tracked its own best-of-both checkpoint on the
        # frozen suite; prefer it over the (possibly degraded) final.
        best = ckpt.restore_latest(os.path.join(round_dir, "best"), ft)
        cand = best if best is not None else ft
        after = _suite_metrics(cfg, cand, suite_scenes, planner_track)
        row["after"] = after
        from ndivplanning_tpu.train.loop import _improved

        accepted = _improved(track, after.get(track), best_val)
        div_after = after.get("eval_mean_pairwise_dist", 0.0)
        if accepted and div_after < div_floor:
            accepted = False
            row["rejected_for_diversity"] = {
                "eval_mean_pairwise_dist": div_after,
                "floor": div_floor}
        row["accepted"] = bool(accepted)
        if accepted:
            state = cand
            best_val = after.get(track)
            before = after
        with open(row_path, "w", encoding="utf-8") as f:
            json.dump(row, f)
        report.append(row)
    return state, report
