"""LR schedule tests (SURVEY.md §2 C11 extension): schedule shapes,
training integration, checkpoint roundtrip, CLI --set typing."""

import jax
import numpy as np
import pytest

from ndivplanning_tpu.train.state import create_train_state, lr_schedule
from ndivplanning_tpu.train.step import train_chunk, train_step_fused
from ndivplanning_tpu.utils.config import get_config


def _small(**kw):
    defaults = dict(batch_size=8, k=4, g_hidden=(32,), d_hidden=(32,),
                    cond_embed_dim=8, steps=100)
    defaults.update(kw)
    return get_config("pointmass2d", **defaults)


def test_constant_no_warmup_is_plain_float():
    # Keeps the optimizer state schema (and old checkpoints) unchanged.
    cfg = _small()
    assert lr_schedule(cfg, cfg.g_lr) == cfg.g_lr


def test_cosine_with_warmup_shape():
    cfg = _small(lr_schedule="cosine", warmup_steps=10, lr_final_ratio=0.1,
                 steps=100)
    sched = lr_schedule(cfg, 1e-3)
    assert callable(sched)
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == pytest.approx(1e-3)
    # Cosine lands on final_ratio * peak at the decay horizon.
    assert float(sched(100)) == pytest.approx(1e-4, rel=1e-3)
    # Monotone decay after warmup.
    mid = float(sched(55))
    assert 1e-4 < mid < 1e-3


def test_linear_schedule_shape():
    cfg = _small(lr_schedule="linear", lr_final_ratio=0.5, steps=100)
    sched = lr_schedule(cfg, 2e-3)
    assert float(sched(0)) == pytest.approx(2e-3)
    assert float(sched(50)) == pytest.approx(1.5e-3, rel=1e-5)
    assert float(sched(100)) == pytest.approx(1e-3, rel=1e-5)


def test_unknown_schedule_raises():
    cfg = _small(lr_schedule="triangular")
    with pytest.raises(ValueError, match="lr_schedule"):
        lr_schedule(cfg, 1e-3)


def test_train_with_schedule_runs_and_logs_lr():
    cfg = _small(lr_schedule="cosine", warmup_steps=5, steps=100)
    state = create_train_state(cfg)
    state, metrics = train_step_fused(cfg, state)
    assert "g_lr" in metrics
    # First update happens at schedule position 0 (warmup start).
    assert float(metrics["g_lr"]) == 0.0
    state, metrics = train_chunk(cfg, state, 9)
    lrs = np.asarray(metrics["g_lr"])
    assert lrs.shape == (9,)
    # Warmup ramps strictly upward through step 5, then cosine decays.
    assert float(lrs[4]) == pytest.approx(cfg.g_lr)  # position 5 == peak
    assert np.all(np.diff(lrs[:5]) > 0)
    assert np.all(lrs[5:] <= cfg.g_lr)


def test_schedule_checkpoint_roundtrip(tmp_path):
    from ndivplanning_tpu.utils import checkpoint as ckpt

    cfg = _small(lr_schedule="cosine", warmup_steps=5, steps=100)
    state = create_train_state(cfg)
    state, _ = train_step_fused(cfg, state)
    ckpt.save_checkpoint(str(tmp_path), state)
    restored = ckpt.restore_latest(str(tmp_path), create_train_state(cfg))
    assert restored is not None
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cli_set_override_typing():
    from ndivplanning_tpu.cli import _parse_field_value

    assert _parse_field_value("lr_schedule", "cosine") == "cosine"
    assert _parse_field_value("warmup_steps", "500") == 500
    assert _parse_field_value("g_ema_decay", "0.999") == 0.999
    assert _parse_field_value("g_hidden", "512,512") == (512, 512)
    with pytest.raises(SystemExit):
        _parse_field_value("warmup_steps", "abc")
    with pytest.raises(SystemExit):
        _parse_field_value("not_a_field", "1")
