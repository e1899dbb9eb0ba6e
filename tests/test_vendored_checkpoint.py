"""The vendored pretrained checkpoint loads and keeps its quality.

checkpoints/planning512 is the deployable planning model BASELINE.md's
serving claims are measured over (frozen-suite 0.833 @ 512 scenes).
This pins (a) the CLI loading path — recorded config.json as base,
<workdir>/best preferred — against schema drift (a TrainState field
change would silently break every shipped artifact), and (b) a quality
floor on a 128-scene slice of the frozen suite, so the repo cannot
drift into shipping weights that no longer match the claims.
"""

import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKDIR = os.path.join(REPO, "checkpoints", "planning512")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(WORKDIR), reason="vendored checkpoint not present")


def test_vendored_planning512_restores_and_scores():
    from ndivplanning_tpu.train.evaluate import evaluate_fixed
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt
    from ndivplanning_tpu.utils.config import load_config

    cfg = load_config(WORKDIR)
    assert cfg is not None and cfg.name == "planning"
    assert cfg.batch_size == 512 and cfg.lr_schedule == "cosine"

    state = create_train_state(cfg)
    best = ckpt.restore_latest(os.path.join(WORKDIR, "best"), state)
    assert best is not None, "best/ checkpoint failed to restore"
    assert int(best.step) == 55000  # best/best_path.json provenance

    # 128-scene slice of the frozen suite (the full 512-scene score is
    # 0.833; this 128-slice measured 0.835 on CPU, diversity 0.555).  The
    # floor is far above an untrained model (~0.0-0.1) but safely below
    # the measured value — it catches weight corruption or a loading
    # regression, not eval noise (the suite is frozen, not sampled).
    ev = evaluate_fixed(cfg, best, n_scenes=128)
    assert float(ev["eval_success_rate"]) >= 0.70
    assert float(ev["eval_mean_pairwise_dist"]) >= 0.05


def test_vendored_quadrotor150k_restores_and_scores():
    # The underactuated-family checkpoint behind the measured
    # closed-loop result (open 0.310 / MPC 1.000 at 512 scenes,
    # BASELINE.md).  Open-loop 128-slice measured 0.3105 on CPU; the
    # floor catches corruption, not eval noise.  A 4-episode MPC slice
    # pins the closed-loop rescue itself (measured 1.0 over the suite).
    import jax

    from ndivplanning_tpu.planning.mpc import mpc_rollout_batch
    from ndivplanning_tpu.planning.server import _condition_for
    from ndivplanning_tpu.train.evaluate import evaluate_fixed, make_eval_suite
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt
    from ndivplanning_tpu.utils.config import load_config

    wd = os.path.join(REPO, "checkpoints", "quadrotor150k")
    if not os.path.isdir(wd):
        pytest.skip("vendored quadrotor checkpoint not present")
    cfg = load_config(wd)
    assert cfg is not None and cfg.env == "quadrotor"
    assert cfg.lr_schedule == "cosine"

    state = create_train_state(cfg)
    best = ckpt.restore_latest(os.path.join(wd, "best"), state)
    assert best is not None
    assert int(best.step) == 30000

    ev = evaluate_fixed(cfg, best, n_scenes=128)
    assert float(ev["eval_success_rate"]) >= 0.20
    assert float(ev["eval_mean_pairwise_dist"]) >= 0.3

    suite = make_eval_suite(cfg, 4)
    scenes = suite.scenes
    conds = jax.vmap(lambda s: _condition_for(cfg, s))(scenes)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    r = mpc_rollout_batch(cfg, best, scenes, conds, keys, total_steps=64,
                          replan_every=8, n_candidates=64)
    assert float(r.reached.mean()) >= 0.75  # measured 1.0 at suite scale


def test_vendored_unicycle_and_reacher_restore_and_score():
    # The r3n family checkpoints: per-draw eval measured 0.997/0.980 at
    # suite scale (BASELINE.md) — the floors catch corruption, not eval
    # noise, and the loading path pins schema compatibility.
    from ndivplanning_tpu.train.evaluate import evaluate_fixed
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt
    from ndivplanning_tpu.utils.config import load_config

    for name, env, step, floor in [
        ("unicycle150k", "unicycle", 120000, 0.9),
        ("reacher150k", "reacher", 105000, 0.85),
    ]:
        wd = os.path.join(REPO, "checkpoints", name)
        if not os.path.isdir(wd):
            pytest.skip(f"vendored {name} checkpoint not present")
        cfg = load_config(wd)
        assert cfg is not None and cfg.env == env
        assert cfg.lr_schedule == "cosine"
        state = create_train_state(cfg)
        best = ckpt.restore_latest(os.path.join(wd, "best"), state)
        assert best is not None, name
        assert int(best.step) == step, name
        ev = evaluate_fixed(cfg, best, n_scenes=128)
        assert float(ev["eval_success_rate"]) >= floor, (name, ev)
        assert float(ev["eval_mean_pairwise_dist"]) >= 0.3, name


def test_vendored_quadrotor_distilled_restores_and_scores():
    # The round-4 expert-iteration result: quadrotor150k fine-tuned on
    # cem+trajopt expert data, three accepted rounds (BASELINE.md —
    # 0.310 -> 0.445 at 512 scenes; this 128-slice measured 0.4521 on
    # CPU at diversity 0.483).  Floors catch corruption/loading drift,
    # not eval noise; the base checkpoint's 128-slice is ~0.31, so the
    # success floor also pins that the DISTILLED weights shipped, not a
    # copy of the base.
    from ndivplanning_tpu.train.evaluate import evaluate_fixed
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt
    from ndivplanning_tpu.utils.config import load_config

    wd = os.path.join(REPO, "checkpoints", "quadrotor_distilled")
    if not os.path.isdir(wd):
        pytest.skip("vendored quadrotor_distilled checkpoint not present")
    cfg = load_config(wd)
    assert cfg is not None and cfg.env == "quadrotor"
    state = create_train_state(cfg)
    best = ckpt.restore_latest(os.path.join(wd, "best"), state)
    assert best is not None
    assert int(best.step) == 504  # best_path.json provenance
    ev = evaluate_fixed(cfg, best, n_scenes=128)
    assert float(ev["eval_success_rate"]) >= 0.40, ev
    assert float(ev["eval_mean_pairwise_dist"]) >= 0.40, ev


def test_vendored_quadrotor_distilled_ilqr_restores_and_scores():
    # The round-5 expert-iteration result with the iLQR-36 teacher
    # (BASELINE.md r5 — 0.310 -> 0.519 at 512 scenes over two accepted
    # rounds, best-of-both 0.536 on TPU; this 128-slice measured 0.5225
    # on CPU at diversity 0.482, the 512-scene CPU re-eval 0.5144).
    # Floors pin that the iLQR-DISTILLED weights shipped: the base
    # checkpoint's 128-slice is ~0.31 and the cem+trajopt-distilled
    # one's is ~0.45, so >=0.48 separates it from both.
    from ndivplanning_tpu.train.evaluate import evaluate_fixed
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt
    from ndivplanning_tpu.utils.config import load_config

    wd = os.path.join(REPO, "checkpoints", "quadrotor_distilled_ilqr")
    if not os.path.isdir(wd):
        pytest.skip("vendored quadrotor_distilled_ilqr checkpoint not present")
    cfg = load_config(wd)
    assert cfg is not None and cfg.env == "quadrotor"
    state = create_train_state(cfg)
    best = ckpt.restore_latest(os.path.join(wd, "best"), state)
    assert best is not None
    assert int(best.step) == 1512  # best_path.json provenance
    ev = evaluate_fixed(cfg, best, n_scenes=128)
    assert float(ev["eval_success_rate"]) >= 0.48, ev
    assert float(ev["eval_mean_pairwise_dist"]) >= 0.40, ev


def test_vendored_unicycle_distilled_restores_and_scores():
    # The round-5 score-axis expert-iteration result: unicycle150k
    # fine-tuned on trajopt-64 expert data, adjudicated on the OPEN-LOOP
    # plan score (BASELINE.md r5 — one-shot eval_plan_best_score 0.5465
    # -> 0.1769 at 512 scenes over two accepted rounds; this 128-slice
    # measured 0.1753 on CPU, base 0.5414, reach 1.0 both).  The score
    # ceiling <=0.30 pins that the DISTILLED weights shipped (3x from
    # the base); the success/diversity floors catch corruption — the
    # distilled student trades per-draw success (0.89 vs 1.0) for a 3.1x
    # better best-of-population score at HIGHER diversity (0.87 vs
    # 0.74), the serving-relevant axes.
    from ndivplanning_tpu.train.evaluate import (evaluate_fixed,
                                                 evaluate_fixed_planner)
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt
    from ndivplanning_tpu.utils.config import load_config

    wd = os.path.join(REPO, "checkpoints", "unicycle_distilled")
    if not os.path.isdir(wd):
        pytest.skip("vendored unicycle_distilled checkpoint not present")
    cfg = load_config(wd)
    assert cfg is not None and cfg.env == "unicycle"
    state = create_train_state(cfg)
    best = ckpt.restore_latest(os.path.join(wd, "best"), state)
    assert best is not None
    assert int(best.step) == 4536  # best_path.json provenance
    ev = evaluate_fixed(cfg, best, n_scenes=128)
    assert float(ev["eval_success_rate"]) >= 0.80, ev
    assert float(ev["eval_mean_pairwise_dist"]) >= 0.50, ev
    pm = evaluate_fixed_planner(cfg, best, planner="oneshot", n_scenes=128)
    assert float(pm["eval_plan_best_score"]) <= 0.30, pm
    assert float(pm["eval_plan_reach_rate"]) >= 0.99, pm
