"""Recorded-config roundtrip: train() writes <workdir>/config.json and
the CLI uses it as the base config for eval/plan/serve, so checkpoints
with schedule-dependent optimizer schemas restore without the user
retyping every flag."""

import json

import pytest

from ndivplanning_tpu.utils.config import (
    Config,
    config_from_dict,
    get_config,
    load_config,
    save_config,
)


def test_config_json_roundtrip(tmp_path):
    cfg = get_config("goalcond", batch_size=16, k=4,
                     lr_schedule="cosine", warmup_steps=7,
                     g_hidden=(64, 32))
    save_config(cfg, str(tmp_path))
    loaded = load_config(str(tmp_path))
    assert loaded == cfg  # tuples restored from JSON lists


def test_load_config_missing_returns_none(tmp_path):
    assert load_config(str(tmp_path / "nope")) is None


def test_config_from_dict_ignores_unknown_fields():
    d = {"name": "x", "batch_size": 4, "field_from_the_future": 1}
    cfg = config_from_dict(d)
    assert cfg.batch_size == 4
    assert not hasattr(cfg, "field_from_the_future")


def _args(argv):
    """Parse argv through the real CLI parser, return the built config."""
    import argparse

    from ndivplanning_tpu.cli import _add_common, _build_config

    parser = argparse.ArgumentParser()
    _add_common(parser)
    return _build_config(parser.parse_args(argv))


def test_cli_uses_recorded_config_as_base(tmp_path):
    cfg = get_config("goalcond", batch_size=16, k=4,
                     lr_schedule="cosine", warmup_steps=7)
    save_config(cfg, str(tmp_path))
    built = _args(["--workdir", str(tmp_path)])
    assert built == cfg.replace(workdir=str(tmp_path))
    # Explicit flags override the recorded base.
    built = _args(["--workdir", str(tmp_path), "--k", "8",
                   "--set", "lr_schedule=linear"])
    assert built.k == 8
    assert built.lr_schedule == "linear"
    assert built.warmup_steps == 7  # still from the recorded config


def test_cli_explicit_other_preset_opts_out(tmp_path):
    save_config(get_config("goalcond", k=4), str(tmp_path))
    built = _args(["--workdir", str(tmp_path), "--preset", "pointmass2d"])
    assert built.name == "pointmass2d"
    assert built.k == 8  # preset default, recorded k=4 ignored


def test_train_records_config(tmp_path):
    from ndivplanning_tpu.train.loop import train

    cfg = get_config("pointmass2d", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), steps=4, log_every=2,
                     checkpoint_every=0, eval_every=0,
                     workdir=str(tmp_path))
    train(cfg, echo=False)
    with open(tmp_path / "config.json", encoding="utf-8") as f:
        assert json.load(f)["batch_size"] == 8
    assert load_config(str(tmp_path)) == cfg


def test_schema_mismatch_error_is_actionable(tmp_path):
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils import checkpoint as ckpt

    sched_cfg = get_config("pointmass2d", batch_size=8, k=4,
                           g_hidden=(32,), d_hidden=(32,),
                           lr_schedule="cosine", steps=100)
    state = create_train_state(sched_cfg)
    ckpt.save_checkpoint(str(tmp_path), state)

    plain_cfg = sched_cfg.replace(lr_schedule="constant")
    with pytest.raises(ValueError, match="config.json"):
        ckpt.restore_latest(str(tmp_path),
                            create_train_state(plain_cfg))
