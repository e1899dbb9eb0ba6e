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
    # Best checkpoint is from one of the eval boundaries.
    assert int(best.step) in (5, 10)

    # Metrics stream carries the frozen-suite eval rows.
    import json

    rows = [json.loads(line) for line in
            open(f"{tmp_path}/metrics.jsonl", encoding="utf-8")]
    evs = [r for r in rows if r.get("kind") == "eval"]
    assert evs and "eval_success_rate" in evs[0]
