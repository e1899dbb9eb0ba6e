"""train() host loop end-to-end: chunk boundaries, logging, eval, resume."""

import json
import os

from ndivplanning_tpu.train.loop import train
from ndivplanning_tpu.utils.config import get_config


def _cfg(tmp, **kw):
    d = dict(batch_size=8, k=4, g_hidden=(32,), d_hidden=(32,),
             cond_embed_dim=8, workdir=str(tmp), log_every=5,
             checkpoint_every=10, eval_every=10, steps=17)
    d.update(kw)
    return get_config("pointmass2d", **d)


def test_train_loop_boundaries_and_artifacts(tmp_path):
    cfg = _cfg(tmp_path)
    state, history = train(cfg, echo=False)
    assert int(state.step) == 17
    # Log rows at 5, 10, 15, 17 (final).
    assert [h["step"] for h in history] == [5, 10, 15, 17]
    # metrics.jsonl exists with train + eval rows.
    rows = [json.loads(l) for l in
            open(os.path.join(cfg.workdir, "metrics.jsonl"))]
    kinds = {r.get("kind", "train") for r in rows}
    assert "eval" in kinds
    # checkpoints written
    assert os.path.isdir(os.path.join(cfg.workdir, "checkpoints"))


def test_train_loop_restores(tmp_path):
    cfg = _cfg(tmp_path, steps=10)
    train(cfg, echo=False)
    # Second call restores from step 10 and continues to 15.
    cfg2 = cfg.replace(steps=15)
    state, history = train(cfg2, echo=False)
    assert int(state.step) == 15
    assert history[0]["step"] == 15  # only the new window logged


def test_best_checkpoint_tracking(tmp_path):
    """train() keeps <workdir>/best at the eval point with the highest
    tracked metric; CLI-style loading prefers it over latest."""
    import os

    from ndivplanning_tpu.utils import checkpoint as ckpt
    from ndivplanning_tpu.train.state import create_train_state

    cfg = get_config("pointmass2d", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, log_every=5,
                     eval_every=5, checkpoint_every=10,
                     eval_suite_scenes=32, steps=15)
    state, _ = train(cfg, workdir=str(tmp_path), echo=False)
    best_dir = os.path.join(str(tmp_path), "best")
    assert ckpt.latest_step(best_dir) is not None
    best = ckpt.restore_latest(best_dir, create_train_state(cfg))
    # Best checkpoint is from one of the eval boundaries (final included).
    assert int(best.step) in (5, 10, 15)

    # Metrics stream carries the frozen-suite eval rows.
    import json

    rows = [json.loads(line) for line in
            open(f"{tmp_path}/metrics.jsonl", encoding="utf-8")]
    evs = [r for r in rows if r.get("kind") == "eval"]
    assert evs and "eval_success_rate" in evs[0]


def test_best_of_both_selects_raw_winner(tmp_path, monkeypatch):
    """With EMA tracking on, the best-checkpoint tracker evaluates BOTH
    generator paths; when the raw one scores higher, <workdir>/best is
    saved with the raw weights in the EMA slot (so gen_params serves the
    winner) and best_path.json records eval_path='raw'."""
    import json
    import os

    import jax
    import numpy as np

    from ndivplanning_tpu.train import loop as loop_mod
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt

    cfg = get_config("goalcond", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, log_every=5,
                     eval_every=5, checkpoint_every=10,
                     eval_suite_scenes=16, steps=15, g_ema_decay=0.9)

    # Controlled eval: raw path always out-scores the EMA path.
    def fake_eval(cfg_, state_, n_scenes=0, seed=0, use_ema=True):
        return {"eval_success_rate": 0.2 if use_ema else 0.9}

    monkeypatch.setattr(loop_mod, "evaluate_fixed", fake_eval)
    train(cfg, workdir=str(tmp_path), echo=False)

    best_dir = os.path.join(str(tmp_path), "best")
    marker = json.load(open(os.path.join(best_dir, "best_path.json"),
                            encoding="utf-8"))
    assert marker["eval_path"] == "raw"
    assert marker["value"] == 0.9
    best = ckpt.restore_latest(best_dir, create_train_state(cfg))
    # The EMA slot holds the raw winner's weights (not a trailing EMA).
    for a, b in zip(jax.tree.leaves(best.g_params),
                    jax.tree.leaves(best.g_ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # The eval metrics row carries both paths' tracked metric.
    rows = [json.loads(line) for line in
            open(f"{tmp_path}/metrics.jsonl", encoding="utf-8")]
    evs = [r for r in rows if r.get("kind") == "eval"]
    assert evs and evs[0]["raw_eval_success_rate"] == 0.9
    assert evs[0]["eval_success_rate"] == 0.2


def test_best_of_both_ema_winner_keeps_ema(tmp_path, monkeypatch):
    """When the EMA path wins, best keeps the genuine EMA weights
    (distinct from the raw ones) and the marker says 'ema'."""
    import json
    import os

    import jax
    import numpy as np

    from ndivplanning_tpu.train import loop as loop_mod
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt

    cfg = get_config("goalcond", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, log_every=5,
                     eval_every=5, checkpoint_every=10,
                     eval_suite_scenes=16, steps=15, g_ema_decay=0.9)

    def fake_eval(cfg_, state_, n_scenes=0, seed=0, use_ema=True):
        return {"eval_success_rate": 0.9 if use_ema else 0.2}

    monkeypatch.setattr(loop_mod, "evaluate_fixed", fake_eval)
    train(cfg, workdir=str(tmp_path), echo=False)

    best_dir = os.path.join(str(tmp_path), "best")
    marker = json.load(open(os.path.join(best_dir, "best_path.json"),
                            encoding="utf-8"))
    assert marker["eval_path"] == "ema"
    best = ckpt.restore_latest(best_dir, create_train_state(cfg))
    live = jax.tree.leaves(best.g_params)[0]
    ema = jax.tree.leaves(best.g_ema_params)[0]
    assert not np.allclose(np.asarray(live), np.asarray(ema))


def test_best_metric_survives_resume(tmp_path, monkeypatch):
    """A resumed run's best tracker continues from the value recorded in
    best/best_path.json — the first post-resume eval (an oscillation
    trough) must NOT overwrite a better already-saved best."""
    import json
    import os

    from ndivplanning_tpu.train import loop as loop_mod
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt

    cfg = get_config("pointmass2d", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, log_every=5,
                     eval_every=5, checkpoint_every=10,
                     eval_suite_scenes=16, steps=10)

    monkeypatch.setattr(loop_mod, "evaluate_fixed",
                        lambda *a, **k: {"eval_success_rate": 0.8})
    train(cfg, workdir=str(tmp_path), echo=False)
    best_dir = os.path.join(str(tmp_path), "best")
    saved_step = ckpt.latest_step(best_dir)
    assert saved_step is not None

    # Resume to step 20 with WORSE eval everywhere: best must not move.
    monkeypatch.setattr(loop_mod, "evaluate_fixed",
                        lambda *a, **k: {"eval_success_rate": 0.1})
    train(cfg.replace(steps=20), workdir=str(tmp_path), echo=False)
    marker = json.load(open(os.path.join(best_dir, "best_path.json"),
                            encoding="utf-8"))
    assert marker["value"] == 0.8
    assert ckpt.latest_step(best_dir) == saved_step

    # And a resumed IMPROVEMENT still lands.
    monkeypatch.setattr(loop_mod, "evaluate_fixed",
                        lambda *a, **k: {"eval_success_rate": 0.9})
    train(cfg.replace(steps=30), workdir=str(tmp_path), echo=False)
    marker = json.load(open(os.path.join(best_dir, "best_path.json"),
                            encoding="utf-8"))
    assert marker["value"] == 0.9


def test_nan_eval_never_wins_best(tmp_path, monkeypatch):
    """A NaN tracked metric neither saves a best checkpoint nor freezes
    the tracker (NaN comparisons are all False — an unguarded tracker
    would never save again after one NaN eval)."""
    import json
    import os

    from ndivplanning_tpu.train import loop as loop_mod

    cfg = get_config("pointmass2d", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, log_every=5,
                     eval_every=5, checkpoint_every=10,
                     eval_suite_scenes=16, steps=12)

    vals = iter([float("nan"), 0.5, 0.4])  # evals at 5, 10, 12 (final)
    monkeypatch.setattr(
        loop_mod, "evaluate_fixed",
        lambda *a, **k: {"eval_success_rate": next(vals)})
    train(cfg, workdir=str(tmp_path), echo=False)
    marker = json.load(open(
        os.path.join(str(tmp_path), "best", "best_path.json"),
        encoding="utf-8"))
    # The NaN eval at step 5 was skipped; the 0.5 at step 10 won.
    assert marker["value"] == 0.5
    assert marker["step"] == 10


def test_dataset_marker_rejects_same_shape_different_content(tmp_path):
    """Resuming a dataset run against a DIFFERENT same-shaped dataset is
    refused: the fingerprint hashes content, not just shapes."""
    import numpy as np
    import pytest

    from ndivplanning_tpu.data.host_pipeline import ArrayDataset
    from ndivplanning_tpu.train.loop import (
        _check_dataset_marker,
        _write_dataset_marker,
    )

    cfg = _cfg(tmp_path)
    rng = np.random.default_rng(0)
    mk = lambda: ArrayDataset({
        "conditions": rng.standard_normal((32, 4)).astype(np.float32),
        "real_traj": rng.standard_normal((32, 8, 2)).astype(np.float32)})
    a, b = mk(), mk()
    _write_dataset_marker(str(tmp_path), a, cfg)
    _check_dataset_marker(str(tmp_path), a, cfg)  # same content: OK
    with pytest.raises(ValueError, match="different dataset"):
        _check_dataset_marker(str(tmp_path), b, cfg)


def test_best_tracker_diversity_disqualifier(tmp_path):
    """best_min_diversity (round 4): a collapsed candidate cannot become
    <workdir>/best even with a better tracked metric; healthy candidates
    still win; knob off keeps old behaviour."""
    from ndivplanning_tpu.train.loop import _track_best
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config("pointmass2d", batch_size=8, k=4, g_hidden=(16,),
                     d_hidden=(16,), cond_embed_dim=8,
                     best_min_diversity=0.5, workdir="")
    state = create_train_state(cfg)
    wd = str(tmp_path / "run")

    # Collapsed high-success candidate: skipped entirely (no save).
    best = _track_best(cfg, wd, 10,
                       [("ema", 0.9, state, 0.04)], None)
    assert best is None
    assert not os.path.exists(os.path.join(wd, "best"))

    # Healthy lower-success candidate: becomes best.
    best = _track_best(cfg, wd, 20,
                       [("ema", 0.6, state, 0.7)], best)
    assert best == 0.6
    assert os.path.exists(os.path.join(wd, "best", "best_path.json"))

    # Mixed candidates at one eval point: the healthy one wins even
    # though the collapsed one has the higher metric.
    best = _track_best(cfg, wd, 30,
                       [("ema", 0.95, state, 0.1),
                        ("raw", 0.7, state, 0.8)], best)
    assert best == 0.7

    # Knob off: the collapsed candidate wins again.
    cfg_off = cfg.replace(best_min_diversity=0.0)
    best_off = _track_best(cfg_off, str(tmp_path / "off"), 10,
                           [("ema", 0.9, state, 0.04)], None)
    assert best_off == 0.9
