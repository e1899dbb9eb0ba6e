"""Checkpoint/resume: a restored run continues the exact bitwise loss
curve (SURVEY.md §5 failure detection / checkpoint-resume; resume-after-
kill simulated by restoring into a fresh state)."""

import numpy as np

from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.train.step import train_step_fused
from ndivplanning_tpu.utils import checkpoint as ckpt
from ndivplanning_tpu.utils.config import get_config


def _cfg(tmp):
    return get_config("pointmass2d", batch_size=8, k=4, g_hidden=(32,),
                      d_hidden=(32,), cond_embed_dim=8,
                      workdir=str(tmp))


def test_save_restore_roundtrip(tmp_path):
    cfg = _cfg(tmp_path)
    state = create_train_state(cfg)
    for _ in range(3):
        state, _ = train_step_fused(cfg, state)
    ckpt.save_checkpoint(cfg.workdir, state)

    template = create_train_state(cfg)
    restored = ckpt.restore_latest(cfg.workdir, template)
    assert restored is not None
    assert int(restored.step) == 3
    import jax

    for a, b in zip(jax.tree.leaves(state.g_params),
                    jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_bitwise_curve(tmp_path):
    cfg = _cfg(tmp_path)

    # Uninterrupted 10-step run.
    state = create_train_state(cfg)
    full = []
    for _ in range(10):
        state, m = train_step_fused(cfg, state)
        full.append(float(m["g_ndiv"]))

    # Killed-at-5 run: checkpoint, fresh process simulated by new state.
    state2 = create_train_state(cfg)
    first = []
    for _ in range(5):
        state2, m = train_step_fused(cfg, state2)
        first.append(float(m["g_ndiv"]))
    ckpt.save_checkpoint(cfg.workdir, state2, step=5)

    resumed = ckpt.restore_latest(cfg.workdir, create_train_state(cfg))
    second = []
    for _ in range(5):
        resumed, m = train_step_fused(cfg, resumed)
        second.append(float(m["g_ndiv"]))

    np.testing.assert_array_equal(np.asarray(full),
                                  np.asarray(first + second))


def test_restore_none_when_empty(tmp_path):
    cfg = _cfg(tmp_path / "empty")
    template = create_train_state(cfg)
    assert ckpt.restore_latest(cfg.workdir, template) is None


def _save_legacy(tmp_path, state, missing):
    """Write a checkpoint with `missing` TrainState fields dropped,
    simulating an older schema generation."""
    import dataclasses

    import orbax.checkpoint as ocp

    legacy = {f.name: getattr(state, f.name)
              for f in dataclasses.fields(state)
              if f.name not in missing}
    mgr = ocp.CheckpointManager(str(tmp_path / "checkpoints"))
    mgr.save(0, args=ocp.args.StandardSave(legacy))
    mgr.wait_until_finished()
    mgr.close()


def test_legacy_checkpoint_without_ema_restores(tmp_path):
    """Round-2-era checkpoints (no g_ema_params, no lecam_ema) must
    restore with the EMA slot seeded from g_params and zero LeCam
    trackers (round-2 review; utils/checkpoint.py::_restore_legacy)."""
    import jax

    cfg = _cfg(tmp_path)
    state = create_train_state(cfg)
    _save_legacy(tmp_path, state, ("g_ema_params", "lecam_ema", "ada"))

    restored = ckpt.restore_latest(str(tmp_path), state)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(restored.g_params),
                    jax.tree.leaves(restored.g_ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(restored.lecam_ema["real"]) == 0.0
    assert float(restored.lecam_ema["fake"]) == 0.0
    # Restored state trains (no aliased-donation crash).
    s2, _ = train_step_fused(cfg, restored)
    assert int(s2.step) == 1


def test_legacy_checkpoint_without_lecam_restores(tmp_path):
    """Mid-round-3 checkpoints (g_ema_params present, lecam_ema missing)
    restore with fresh zero trackers and keep the stored EMA params."""
    import jax
    import jax.numpy as jnp

    cfg = _cfg(tmp_path)
    state = create_train_state(cfg)
    # Make the EMA leg distinguishable from g_params to prove the stored
    # value (not a reseed) is what comes back.
    state = state.replace(g_ema_params=jax.tree.map(
        lambda p: p + jnp.float32(1.0), state.g_params))
    _save_legacy(tmp_path, state, ("lecam_ema", "ada"))

    template = create_train_state(cfg)
    restored = ckpt.restore_latest(str(tmp_path), template)
    assert restored is not None
    for a, b in zip(jax.tree.leaves(state.g_ema_params),
                    jax.tree.leaves(restored.g_ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(restored.lecam_ema["real"]) == 0.0
    s2, _ = train_step_fused(cfg, restored)
    assert int(s2.step) == 1


def test_legacy_checkpoint_without_ada_restores(tmp_path):
    """Round-2/3 checkpoints (everything but the ADA controller state —
    the shipped family checkpoints' generation) restore with ada zeroed
    (augmentation off: the controller's own cold start) and every stored
    field kept."""
    import jax
    import jax.numpy as jnp

    cfg = _cfg(tmp_path)
    state = create_train_state(cfg)
    state = state.replace(lecam_ema={"real": jnp.float32(0.25),
                                     "fake": jnp.float32(-0.5)})
    _save_legacy(tmp_path, state, ("ada",))

    template = create_train_state(cfg)
    restored = ckpt.restore_latest(str(tmp_path), template)
    assert restored is not None
    assert float(restored.lecam_ema["real"]) == 0.25
    assert float(restored.lecam_ema["fake"]) == -0.5
    assert float(restored.ada["p"]) == 0.0
    assert float(restored.ada["r"]) == 0.0
    for a, b in zip(jax.tree.leaves(state.g_params),
                    jax.tree.leaves(restored.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s2, _ = train_step_fused(cfg, restored)
    assert int(s2.step) == 1
