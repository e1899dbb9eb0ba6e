"""Randomized stabiliser-combination smoke (SURVEY.md §4 fuzz row,
extended to the config space): every stabiliser was tested in isolation,
but users compose them (the measured SN+DiffAugment combo exists because
composition matters).  Draw seeded random combinations of the round-2/3
knobs and assert a short train run stays finite and structurally sound.
"""

import random

import numpy as np

from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.train.step import train_chunk
from ndivplanning_tpu.utils.config import get_config

_KNOBS = {
    "r1_weight": (0.0, 0.1),
    "instance_noise_sigma": (0.0, 0.05),
    "feature_matching_weight": (0.0, 1.0),
    "d_spectral_norm": (False, True),
    "topk_g_fraction": (0.0, 0.5),
    "div_floor": (0.0, 0.3),
    "lecam_weight": (0.0, 0.3),
    "g_ema_decay": (0.0, 0.99),
    "gan_loss": ("bce", "lsgan", "hinge"),
    "lr_schedule": ("constant", "cosine"),
}


def _random_cfg(rng: random.Random):
    kw = {name: rng.choice(choices) for name, choices in _KNOBS.items()}
    # diffaug needs image conditioning for shift/cutout; exercise it on
    # the goalcond preset only via trajectory-level combos when off.
    preset = rng.choice(["goalcond", "pointmass2d"])
    return get_config(preset, batch_size=8, k=4, g_hidden=(32,),
                      d_hidden=(32,), cond_embed_dim=8, steps=100, **kw), kw


def test_random_stabiliser_combinations_train_finite():
    rng = random.Random(0xC0FFEE)
    for trial in range(10):
        cfg, kw = _random_cfg(rng)
        state = create_train_state(cfg)
        state, metrics = train_chunk(cfg, state, 3)
        for name, v in metrics.items():
            arr = np.asarray(v)
            assert np.all(np.isfinite(arr)), (
                f"trial {trial} metric {name} not finite with {kw}")
        assert int(state.step) == 3
        # Conditional metrics appear exactly when their knob is on.
        assert ("d_lecam" in metrics) == (kw["lecam_weight"] > 0)
        assert ("d_r1" in metrics) == (kw["r1_weight"] > 0)
        assert ("g_divfloor" in metrics) == (kw["div_floor"] > 0)


def test_imagecond_diffaug_combinations_train_finite():
    """DiffAugment composes with SN/LeCam/top-k on the image-conditioned
    preset (tiny raster)."""
    rng = random.Random(0xD1CE)
    for trial in range(4):
        cfg = get_config(
            "imagecond", batch_size=8, k=4, g_hidden=(32,),
            d_hidden=(32,), cond_embed_dim=8, image_size=16, steps=100,
            diffaug=rng.choice(("shift", "cutout", "shift,cutout")),
            d_spectral_norm=rng.choice((False, True)),
            lecam_weight=rng.choice((0.0, 0.3)),
            topk_g_fraction=rng.choice((0.0, 0.5)),
        )
        state = create_train_state(cfg)
        state, metrics = train_chunk(cfg, state, 2)
        for name, v in metrics.items():
            assert np.all(np.isfinite(np.asarray(v))), (trial, name)
        assert int(state.step) == 2
