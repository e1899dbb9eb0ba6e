"""MetricsWriter tests (C13 logging)."""

import json
import os

from ndivplanning_tpu.utils.metrics import MetricsWriter


def test_jsonl_rows(tmp_path):
    w = MetricsWriter(str(tmp_path), echo=False)
    w.write(1, {"loss": 0.5})
    w.write(2, {"loss": 0.25}, kind="eval")
    w.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["step"] == 1 and rows[0]["loss"] == 0.5
    assert rows[1]["kind"] == "eval"
    assert "wall_s" in rows[0]


def test_no_workdir_is_fine():
    w = MetricsWriter(None, echo=False)
    w.write(1, {"x": 1.0})
    w.close()


def test_tensorboard_backend(tmp_path):
    w = MetricsWriter(str(tmp_path), echo=False, tensorboard=True)
    w.write(1, {"loss": 0.5})
    w.close()
    assert os.path.isdir(tmp_path / "tb")
    assert any(os.scandir(tmp_path / "tb"))
