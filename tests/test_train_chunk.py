"""Chunked (scan-fused) training == sequential stepping.

Equality contract: a chunked run is bitwise self-consistent (same program,
same seed), and matches the unscanned sequential path at float tolerance —
XLA may reassociate fusions differently across the two compiled programs
(SURVEY.md §7 hard-parts #1's per-fixed-topology caveat)."""

import jax
import numpy as np

from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.train.step import train_chunk, train_step_fused
from ndivplanning_tpu.utils.config import get_config


def _cfg():
    return get_config("pointmass2d", batch_size=8, k=4, g_hidden=(32,),
                      d_hidden=(32,), cond_embed_dim=8)


def test_chunk_matches_sequential():
    cfg = _cfg()
    s_seq = create_train_state(cfg)
    seq_metrics = []
    for _ in range(8):
        s_seq, m = train_step_fused(cfg, s_seq)
        seq_metrics.append(float(m["g_ndiv"]))

    s_chunk = create_train_state(cfg)
    s_chunk, metrics = train_chunk(cfg, s_chunk, 8)
    np.testing.assert_allclose(
        np.asarray(metrics["g_ndiv"], np.float32),
        np.asarray(seq_metrics, np.float32),
        rtol=1e-4, atol=1e-7,
    )
    assert int(s_chunk.step) == int(s_seq.step) == 8
    for a, b in zip(jax.tree.leaves(s_seq.g_params),
                    jax.tree.leaves(s_chunk.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_chunk_bitwise_self_consistent():
    cfg = _cfg()

    def run():
        s = create_train_state(cfg)
        s, m = train_chunk(cfg, s, 8)
        return np.asarray(m["g_ndiv"])

    np.testing.assert_array_equal(run(), run())


def test_chunks_compose():
    cfg = _cfg()
    s1 = create_train_state(cfg)
    s1, m1 = train_chunk(cfg, s1, 6)

    s2 = create_train_state(cfg)
    s2, a = train_chunk(cfg, s2, 3)
    s2, b = train_chunk(cfg, s2, 3)
    np.testing.assert_allclose(
        np.asarray(m1["g_ndiv"]),
        np.concatenate([np.asarray(a["g_ndiv"]), np.asarray(b["g_ndiv"])]),
        rtol=1e-4, atol=1e-7,
    )


def test_chunk_metrics_shape():
    cfg = _cfg()
    s = create_train_state(cfg)
    s, metrics = train_chunk(cfg, s, 5)
    for k, v in metrics.items():
        assert v.shape == (5,), k
        assert np.all(np.isfinite(np.asarray(v))), k
