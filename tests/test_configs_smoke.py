"""Integration smoke tests: every reference workload config trains a few
steps without NaN, with sane GAN loss ranges (SURVEY.md §4 integration)."""

import numpy as np
import pytest

from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.train.step import train_step_fused
from ndivplanning_tpu.utils.config import PRESETS, get_config


def _shrink(cfg):
    """Same topology, test-sized widths/batches (CPU CI budget)."""
    return cfg.replace(batch_size=8, k=4, g_hidden=(32,), d_hidden=(32,),
                       cond_embed_dim=8, image_size=16, dp_shards=1,
                       div_shards=1)


@pytest.mark.parametrize("preset", sorted(PRESETS))
def test_preset_trains_without_nan(preset):
    cfg = _shrink(get_config(preset))
    state = create_train_state(cfg)
    for _ in range(5):
        state, metrics = train_step_fused(cfg, state)
    for name, v in metrics.items():
        v = float(v)
        assert np.isfinite(v), f"{preset}:{name} = {v}"
    # Sane GAN ranges: BCE D loss around log(4) at the start, not exploded.
    assert 0.0 < float(metrics["d_loss"]) < 20.0


def test_presets_match_reference_workloads():
    # The five BASELINE.json:7-11 workloads must exist with their headline
    # hyperparameters.
    assert get_config("pointmass2d").batch_size == 64
    assert get_config("pointmass2d").k == 8
    assert get_config("pointmass2d").latent_dim == 2
    assert get_config("goalcond").batch_size == 256
    assert get_config("goalcond").horizon == 32
    assert get_config("imagecond").batch_size == 512
    assert get_config("planning").n_candidates == 1000
    assert get_config("pod_dp").batch_size == 8192
    assert get_config("pod_dp").k == 32
    assert get_config("pod_dp").dp_shards == 8


def test_config_hashable_and_replace():
    cfg = get_config("pointmass2d")
    assert hash(cfg) == hash(get_config("pointmass2d"))
    cfg2 = cfg.replace(batch_size=128)
    assert cfg2.batch_size == 128 and cfg.batch_size == 64
    assert cfg.traj_dim == cfg.horizon * cfg.state_dim


def test_unknown_preset_raises():
    with pytest.raises(ValueError):
        get_config("nope")
