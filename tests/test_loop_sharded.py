"""train() host loop through the sharded (pod) path on the virtual mesh."""

import jax
import pytest

from ndivplanning_tpu.train.loop import train
from ndivplanning_tpu.utils.config import get_config

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs 4 (virtual) devices"
)


def test_pod_loop_end_to_end(tmp_path):
    cfg = get_config(
        "pod_dp", dp_shards=2, div_shards=2, batch_size=8, k=4,
        g_hidden=(32,), d_hidden=(32,), cond_embed_dim=8,
        workdir=str(tmp_path), steps=6, log_every=3, checkpoint_every=6,
        eval_every=3,
    )
    state, history = train(cfg, echo=False)
    assert int(state.step) == 6
    assert [h["step"] for h in history] == [3, 6]
    # Restores and continues through the sharded path.
    cfg2 = cfg.replace(steps=9)
    state2, history2 = train(cfg2, echo=False)
    assert int(state2.step) == 9
