"""Expert-iteration distillation tests (train/distill.py).

The loop closed in round 4: record the closed-loop planner's successes as
expert data, fine-tune G on them, measure frozen-suite one-shot quality.
These tests pin the recording schema (exact record_dataset npz format),
the open-loop re-verification filter, the action-mode bridge, the
fine-tune state re-basing, and the end-to-end smoke path on tiny shapes.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ndivplanning_tpu.data.host_pipeline import ArrayDataset
from ndivplanning_tpu.train.distill import (
    RECORD_SEED,
    _subsample_to_horizon,
    _verify_open_loop,
    expert_iteration,
    record_planner_dataset,
    reset_for_finetune,
)
from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.utils.config import get_config


def _cfg(**kw):
    base = dict(batch_size=8, k=4, g_hidden=(32,), d_hidden=(32,),
                cond_embed_dim=8, horizon=16, eval_suite_scenes=16,
                eval_every=8, log_every=8, checkpoint_every=0, workdir="")
    base.update(kw)
    return get_config("goalcond", **base)


def test_record_seed_differs_from_eval_suite():
    from ndivplanning_tpu.train.evaluate import EVAL_SUITE_SEED

    assert RECORD_SEED != EVAL_SUITE_SEED


def test_subsample_identity_and_grid():
    pos = np.arange(2 * 8 * 2, dtype=np.float32).reshape(2, 8, 2)
    np.testing.assert_array_equal(_subsample_to_horizon(pos, 8), pos)
    sub = _subsample_to_horizon(pos, 4)
    # waypoint i sits at executed step ((i+1)*T)//H - 1: 1, 3, 5, 7.
    np.testing.assert_array_equal(sub, pos[:, [1, 3, 5, 7]])


def test_record_mpc_schema_and_filter(tmp_path):
    cfg = _cfg()
    state = create_train_state(cfg)
    path = str(tmp_path / "expert.npz")
    stats = record_planner_dataset(
        cfg, state, 12, path, planner="mpc", n_candidates=16,
        replan_every=4, scene_chunk=8)
    assert stats["kept"] + stats["dropped"] == 12
    assert 0.0 <= stats["open_loop_keep_rate"] <= 1.0
    if stats["kept"] == 0:
        pytest.skip("untrained G found no successes on this seed")
    ds = ArrayDataset.from_npz(path)
    assert ds.size == stats["kept"]
    assert set(ds.arrays) == {"conditions", "real_traj", "scene_start",
                              "scene_goal", "scene_obstacles",
                              "scene_obstacle_mask"}
    assert ds.arrays["real_traj"].shape[1:] == (cfg.horizon, cfg.state_dim)
    # Every kept row re-verifies open-loop successful against its scene.
    from ndivplanning_tpu.data.host_pipeline import scenes_from_arrays

    scenes = jax.tree.map(jnp.asarray,
                          scenes_from_arrays(ds.arrays, cfg.conditioning))
    r, c = _verify_open_loop(cfg, scenes, jnp.asarray(ds.arrays["real_traj"]))
    assert np.all(np.asarray(r) > 0.5)
    assert np.all(np.asarray(c) < 0.5)


def test_record_per_scene_tiles_conditions(tmp_path):
    cfg = _cfg()
    state = create_train_state(cfg)
    path = str(tmp_path / "expert.npz")
    stats = record_planner_dataset(
        cfg, state, 6, path, planner="mpc", n_candidates=16,
        replan_every=4, per_scene=2, scene_chunk=16, success_only=False)
    assert stats["kept"] == 12  # success_only=False keeps every row
    ds = ArrayDataset.from_npz(path)
    # Tiled rows: scene i appears twice, back to back, same condition.
    np.testing.assert_array_equal(ds.arrays["conditions"][0],
                                  ds.arrays["conditions"][1])
    np.testing.assert_array_equal(ds.arrays["scene_goal"][0],
                                  ds.arrays["scene_goal"][1])


def test_record_trajopt_and_rejects_unknown(tmp_path):
    cfg = _cfg(n_candidates=8, trajopt_steps=4)
    state = create_train_state(cfg)
    path = str(tmp_path / "expert_to.npz")
    stats = record_planner_dataset(cfg, state, 8, path, planner="trajopt",
                                   n_candidates=4, scene_chunk=8)
    assert stats["kept"] + stats["dropped"] == 8
    with pytest.raises(ValueError, match="unknown planner"):
        record_planner_dataset(cfg, state, 4, path, planner="rrt")


def test_record_action_mode_distills_actions(tmp_path):
    cfg = _cfg(rollout_mode="actions", env="unicycle")
    state = create_train_state(cfg)
    path = str(tmp_path / "expert_act.npz")
    stats = record_planner_dataset(
        cfg, state, 8, path, planner="mpc", n_candidates=8,
        replan_every=4, scene_chunk=8, success_only=False)
    ds = ArrayDataset.from_npz(path)
    assert ds.size == 8
    # Recorded rows are ACTION sequences of the env family's action dim.
    from ndivplanning_tpu.envs.registry import get_env

    assert ds.arrays["real_traj"].shape[1] == cfg.horizon
    assert stats["planner"] == "mpc"


def test_reset_for_finetune_rebases():
    cfg = _cfg()
    state = create_train_state(cfg)
    state = state.replace(step=jnp.asarray(1234, jnp.int32))
    ft = reset_for_finetune(cfg, state)
    assert int(ft.step) == 0
    # Params carried over untouched.
    a = jax.tree.leaves(state.g_params)[0]
    b = jax.tree.leaves(ft.g_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_expert_iteration_smoke(tmp_path):
    cfg = _cfg()
    state = create_train_state(cfg)
    state, report = expert_iteration(
        cfg, state, rounds=1, scenes_per_round=16, epochs=2,
        n_candidates=16, replan_every=4, scene_chunk=16,
        workdir=str(tmp_path / "distill"), suite_scenes=16)
    assert len(report) == 1
    row = report[0]
    assert "before" in row and "record" in row
    assert row["record"]["kept"] + row["record"]["dropped"] == 16
    if row["record"]["kept"]:
        assert "after" in row and isinstance(row["accepted"], bool)
        # Round artifacts exist: dataset + fine-tune metrics.
        assert os.path.exists(str(tmp_path / "distill" / "round_0" /
                                  "expert.npz"))
    # Monotone: a non-accepted round leaves state's metric intact
    # (accepted rounds update `before` to `after` — checked via report).


def test_train_from_dataset_eval_suite_exclusive(tmp_path):
    from ndivplanning_tpu.train.loop import train_from_dataset

    cfg = _cfg()
    state = create_train_state(cfg)
    path = str(tmp_path / "d.npz")
    record_planner_dataset(cfg, state, 8, path, planner="mpc",
                           n_candidates=8, replan_every=4,
                           success_only=False, scene_chunk=8)
    ds = ArrayDataset.from_npz(path)
    with pytest.raises(ValueError, match="mutually exclusive"):
        train_from_dataset(cfg.replace(batch_size=4), ds, num_epochs=1,
                           state=create_train_state(cfg), restore=False,
                           eval_dataset=ds, eval_suite=True)


def test_diversity_guard_rejects_collapsed_round(tmp_path, monkeypatch):
    """A round whose frozen-suite success improves but whose mean
    pairwise distance fell below min_diversity_frac * pre-iteration
    value must be REJECTED (the quadrotor round-4 failure mode: +0.018
    success at 36x-collapsed ndiv)."""
    import ndivplanning_tpu.train.distill as distill_mod

    cfg = _cfg()
    state = create_train_state(cfg)

    metrics_seq = iter([
        {"eval_success_rate": 0.3, "eval_mean_pairwise_dist": 1.0},
        {"eval_success_rate": 0.9, "eval_mean_pairwise_dist": 0.2},
    ])
    monkeypatch.setattr(distill_mod, "_suite_metrics",
                        lambda *a, **k: next(metrics_seq))
    state2, report = distill_mod.expert_iteration(
        cfg, state, rounds=1, scenes_per_round=16, epochs=1,
        n_candidates=16, replan_every=4, scene_chunk=16,
        workdir=str(tmp_path / "distill"), suite_scenes=16,
        min_diversity_frac=0.5)
    row = report[0]
    if row["record"]["kept"]:  # guard only adjudicates trained rounds
        assert row["accepted"] is False
        assert row["rejected_for_diversity"]["floor"] == 0.5


def test_diversity_guard_off_keeps_old_behaviour(tmp_path, monkeypatch):
    import ndivplanning_tpu.train.distill as distill_mod

    cfg = _cfg()
    state = create_train_state(cfg)
    metrics_seq = iter([
        {"eval_success_rate": 0.3, "eval_mean_pairwise_dist": 1.0},
        {"eval_success_rate": 0.9, "eval_mean_pairwise_dist": 0.2},
    ])
    monkeypatch.setattr(distill_mod, "_suite_metrics",
                        lambda *a, **k: next(metrics_seq))
    _, report = distill_mod.expert_iteration(
        cfg, state, rounds=1, scenes_per_round=16, epochs=1,
        n_candidates=16, replan_every=4, scene_chunk=16,
        workdir=str(tmp_path / "distill2"), suite_scenes=16,
        min_diversity_frac=0.0)
    row = report[0]
    if row["record"]["kept"]:
        assert row["accepted"] is True
        assert "rejected_for_diversity" not in row


def test_rejected_round_state_survives_donation(tmp_path, monkeypatch):
    """Regression (round 4): the fine-tune's chunk step DONATES its
    state; reset_for_finetune must deep-copy the carried leaves or a
    REJECTED round leaves the original state's buffers deleted and the
    next round's recording crashes (masqueraded as a TPU worker flake
    for two chip attempts).  Force two rejected rounds and assert both
    record phases ran on live buffers."""
    import ndivplanning_tpu.train.distill as distill_mod

    cfg = _cfg()
    state = create_train_state(cfg)
    # Scripted metrics: before, then two rejected afters (success down).
    metrics_seq = iter([
        {"eval_success_rate": 0.9, "eval_mean_pairwise_dist": 1.0},
        {"eval_success_rate": 0.1, "eval_mean_pairwise_dist": 1.0},
        {"eval_success_rate": 0.1, "eval_mean_pairwise_dist": 1.0},
    ])
    monkeypatch.setattr(distill_mod, "_suite_metrics",
                        lambda *a, **k: next(metrics_seq))
    _, report = distill_mod.expert_iteration(
        cfg, state, rounds=2, scenes_per_round=16, epochs=1,
        n_candidates=16, replan_every=4, scene_chunk=16,
        workdir=str(tmp_path / "distill"), suite_scenes=16)
    assert len(report) == 2
    assert report[0]["accepted"] is False
    # Round 1 recorded successfully (no deleted-array crash).
    assert "record" in report[1]
    assert (report[1]["record"]["kept"]
            + report[1]["record"]["dropped"]) == 16


def test_expert_iteration_resumes_finished_rounds(tmp_path, monkeypatch):
    """Round-granular crash resume: a re-run over the same workdir skips
    finished rounds (report_row.json), restores an accepted round's
    state from its best checkpoint, and reuses a finished recording."""
    import ndivplanning_tpu.train.distill as distill_mod

    cfg = _cfg()
    state = create_train_state(cfg)
    wd = str(tmp_path / "distill")

    calls = {"record": 0}
    real_record = distill_mod.record_planner_dataset

    def counting_record(*a, **k):
        calls["record"] += 1
        return real_record(*a, **k)

    monkeypatch.setattr(distill_mod, "record_planner_dataset",
                        counting_record)
    _, report1 = distill_mod.expert_iteration(
        cfg, state, rounds=1, scenes_per_round=16, epochs=1,
        n_candidates=16, replan_every=4, scene_chunk=16,
        workdir=wd, suite_scenes=16)
    n_rec = calls["record"]
    assert os.path.exists(os.path.join(wd, "round_0", "report_row.json"))

    # Re-run (simulating a queue retry): round 0 is skipped entirely —
    # no new recording — and the report row round-trips.
    _, report2 = distill_mod.expert_iteration(
        cfg, create_train_state(cfg), rounds=1, scenes_per_round=16,
        epochs=1, n_candidates=16, replan_every=4, scene_chunk=16,
        workdir=wd, suite_scenes=16)
    assert calls["record"] == n_rec
    assert report2[0]["record"] == report1[0]["record"]
    assert report2[0]["accepted"] == report1[0]["accepted"]


def test_subsample_rejects_short_episodes():
    """total_steps < horizon would put index -1 (the FINAL executed
    position) in the first waypoint slot — corrupt expert data; the
    grid refuses instead (round-4 review fix)."""
    pos = np.arange(2 * 8 * 2, dtype=np.float32).reshape(2, 8, 2)
    with pytest.raises(ValueError, match="total_steps"):
        _subsample_to_horizon(pos, 16)


def test_resume_accepted_round_missing_best_raises(tmp_path):
    """An accepted report_row.json whose best checkpoint cannot be
    restored must fail loudly: silently continuing would run round r+1
    from the PRE-round state while the report claims the lift."""
    import json as _json

    cfg = _cfg()
    state = create_train_state(cfg)
    wd = str(tmp_path / "distill")
    rd = os.path.join(wd, "round_0")
    os.makedirs(rd)
    row = {"round": 0, "accepted": True,
           "after": {"eval_success_rate": 0.9,
                     "eval_mean_pairwise_dist": 0.5}}
    with open(os.path.join(rd, "report_row.json"), "w",
              encoding="utf-8") as f:
        _json.dump(row, f)
    with pytest.raises(RuntimeError, match="failed to restore"):
        expert_iteration(cfg, state, rounds=1, scenes_per_round=16,
                         epochs=1, n_candidates=16, replan_every=4,
                         scene_chunk=16, workdir=wd, suite_scenes=16)


# ---------------------- round-5: oneshot teacher + score adjudication --


def test_record_oneshot_teacher(tmp_path):
    """The self-distillation teacher (VERDICT r4 #5): plain best-of-
    population one-shot planning over the current generator, recorded
    through the same open-loop verification filter as every other
    teacher."""
    cfg = _cfg()
    state = create_train_state(cfg)
    path = str(tmp_path / "expert.npz")
    stats = record_planner_dataset(
        cfg, state, 8, path, planner="oneshot", n_candidates=16,
        scene_chunk=8, per_scene=2)
    assert stats["planner"] == "oneshot"
    assert stats["kept"] + stats["dropped"] == 16
    if stats["kept"]:
        with np.load(path) as d:
            assert d["real_traj"].shape == (stats["kept"], cfg.horizon, 2)
            assert d["conditions"].shape[0] == stats["kept"]


def test_plan_best_score_is_lower_better():
    from ndivplanning_tpu.train.loop import _improved

    assert _improved("eval_plan_best_score", 0.1, 0.2)
    assert not _improved("eval_plan_best_score", 0.3, 0.2)


def test_track_planner_score_merges_ladder_metrics(tmp_path):
    """track='eval_plan_best_score' adjudicates rounds on the open-loop
    one-shot planner ladder (the score-axis protocol for families whose
    per-draw success sits at ceiling): the before/after measurements
    carry the eval_plan_* keys and acceptance follows lower-is-better."""
    cfg = _cfg(n_candidates=16)
    state = create_train_state(cfg)
    state, report = expert_iteration(
        cfg, state, rounds=1, scenes_per_round=8, epochs=1,
        n_candidates=8, planner="oneshot", scene_chunk=8,
        workdir=str(tmp_path / "distill"), suite_scenes=8,
        track="eval_plan_best_score")
    row = report[0]
    assert "eval_plan_best_score" in row["before"]
    if row["record"]["kept"]:
        assert "eval_plan_best_score" in row["after"]
        from ndivplanning_tpu.train.loop import _improved

        want = _improved("eval_plan_best_score",
                         row["after"]["eval_plan_best_score"],
                         row["before"]["eval_plan_best_score"])
        # The diversity guard can only flip an accept to a reject.
        if "rejected_for_diversity" not in row:
            assert row["accepted"] == want


def test_stale_recording_is_re_recorded(tmp_path, monkeypatch):
    """Crash-resume reuses a round's expert.npz ONLY when record.json's
    echo matches the current invocation (ADVICE r4): a re-run with a
    changed recording parameter re-records instead of silently
    fine-tuning on stale data."""
    import ndivplanning_tpu.train.distill as distill_mod

    cfg = _cfg()
    state = create_train_state(cfg)
    wd = str(tmp_path / "distill")

    calls = {"record": 0}
    real_record = distill_mod.record_planner_dataset

    def counting_record(*a, **k):
        calls["record"] += 1
        return real_record(*a, **k)

    monkeypatch.setattr(distill_mod, "record_planner_dataset",
                        counting_record)
    distill_mod.expert_iteration(
        cfg, state, rounds=1, scenes_per_round=16, epochs=1,
        n_candidates=16, replan_every=4, scene_chunk=16,
        workdir=wd, suite_scenes=16)
    assert calls["record"] == 1
    # Simulate a crash after recording but before the round finished:
    # the report row vanishes, the recording stays.
    os.remove(os.path.join(wd, "round_0", "report_row.json"))
    import shutil as _sh

    _sh.rmtree(os.path.join(wd, "round_0", "best"), ignore_errors=True)

    # Same parameters -> the recording is reused (no new record call).
    distill_mod.expert_iteration(
        cfg, create_train_state(cfg), rounds=1, scenes_per_round=16,
        epochs=1, n_candidates=16, replan_every=4, scene_chunk=16,
        workdir=wd, suite_scenes=16)
    assert calls["record"] == 1

    # Changed parameter (n_candidates) -> stale echo -> re-record.
    os.remove(os.path.join(wd, "round_0", "report_row.json"))
    _sh.rmtree(os.path.join(wd, "round_0", "best"), ignore_errors=True)
    distill_mod.expert_iteration(
        cfg, create_train_state(cfg), rounds=1, scenes_per_round=16,
        epochs=1, n_candidates=8, replan_every=4, scene_chunk=16,
        workdir=wd, suite_scenes=16)
    assert calls["record"] == 2
