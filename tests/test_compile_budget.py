"""Compile-budget guard (VERDICT round-1 #9).

Every distinct XLA program costs 90-300 s to compile on the TPU tunnel,
so the default train run must stay at a small, PINNED program count —
this test fails if a change quietly introduces per-chunk-size (or other
shape-polymorphic) recompiles.
"""

import json

import numpy as np

from ndivplanning_tpu.train.loop import train
from ndivplanning_tpu.utils.compile_guard import count_compiles
from ndivplanning_tpu.utils.config import get_config


def test_count_compiles_counts():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(x):
        return x * 2.0

    jax.clear_caches()
    with count_compiles() as rec:
        np.asarray(f(jnp.ones((3,))))
        np.asarray(f(jnp.ones((3,))))  # cache hit: no new program
        np.asarray(f(jnp.ones((4,))))  # new shape: one more program
    # Dispatch helpers (broadcast_in_dim etc.) are also real compiles and
    # are counted; `f` itself must appear exactly twice.
    assert rec.names.count("jit(f)") == 2, rec.names


def test_default_train_run_program_budget(tmp_path):
    """A default-cadence train run (boundaries aligned on log_every)
    compiles a HANDFUL of programs: the train chunk, state init, eval,
    and small checkpoint/eval helpers — not one per chunk size."""
    import jax

    cfg = get_config("pointmass2d", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, log_every=50,
                     eval_every=100, checkpoint_every=100)
    jax.clear_caches()
    with count_compiles() as rec:
        train(cfg, num_steps=200, workdir=str(tmp_path), echo=False)
    # Major = compile time >= 0.1 s: the train chunk and evaluate.  The
    # raw count additionally includes the dozens of one-op ~ms programs
    # eager param-init dispatches; those are not the tunnel's 90-300 s
    # hazard.  The pin (<= 4, with slack) trips on any per-chunk-size
    # recompile pattern, which adds one MAJOR program per boundary gap.
    major = rec.major()
    assert any("train_chunk" in n for n in major), (major, rec.names)
    assert len(major) <= 4, f"{len(major)} major programs: {major}"

    # The run logged its compile budget (one line, kind="compile").
    rows = [json.loads(line) for line in
            open(f"{tmp_path}/metrics.jsonl", encoding="utf-8")]
    comp = [r for r in rows if r.get("kind") == "compile"]
    assert len(comp) == 1
    assert comp[0]["xla_programs_compiled"] == rec.count
    assert comp[0]["xla_major_programs"] == len(major)


def test_aligned_boundaries_single_chunk_program(tmp_path):
    """All log/ckpt/eval cadences aligned => exactly one train-chunk
    size; a second run in the same process reuses every program."""
    import jax

    cfg = get_config("pointmass2d", batch_size=8, k=4, g_hidden=(32,),
                     d_hidden=(32,), cond_embed_dim=8, log_every=50,
                     eval_every=0, checkpoint_every=0)
    train(cfg, num_steps=100, workdir="", echo=False)  # warm
    with count_compiles() as rec:
        train(cfg, num_steps=100, workdir="", echo=False)
    assert rec.count == 0, f"unexpected recompiles: {rec.names}"
