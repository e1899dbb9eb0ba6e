"""Host-side training loop (SURVEY.md §3.1 outer loop, C13 wiring).

The loop's only jobs are: call the fused jitted step, surface metrics at
log intervals (a single device->host transfer of four scalars — the step
itself never blocks), checkpoint every N steps, and restore-on-start so a
killed run resumes its exact bitwise loss curve (SURVEY.md §5).
"""

from __future__ import annotations

import time
from typing import Optional

import jax

from ndivplanning_tpu.train.evaluate import evaluate
from ndivplanning_tpu.train.state import TrainState, create_train_state
from ndivplanning_tpu.train.step import train_chunk, train_step_fused
from ndivplanning_tpu.utils import checkpoint as ckpt
from ndivplanning_tpu.utils.config import Config
from ndivplanning_tpu.utils.metrics import MetricsWriter


def train(cfg: Config, num_steps: Optional[int] = None,
          workdir: Optional[str] = None, restore: bool = True,
          echo: bool = True):
    """Train an NDiv-GAN per ``cfg``.

    Returns (final_state, history) where history is the list of logged
    metric rows (used by the determinism tests).
    """
    num_steps = cfg.steps if num_steps is None else num_steps
    workdir = cfg.workdir if workdir is None else workdir

    state = create_train_state(cfg)
    if restore and workdir:
        restored = ckpt.restore_latest(workdir, state)
        if restored is not None:
            state = restored

    # Multi-device configs route through the sharded step (parallel/).
    sharded = cfg.dp_shards * cfg.div_shards > 1
    sharded_steps = {}
    if sharded:
        from ndivplanning_tpu.parallel.sharded_step import (
            make_sharded_train_step,
            shard_state,
        )

        mesh = None

        def sharded_chunk(state, n):
            nonlocal mesh
            if n not in sharded_steps:
                fn, mesh = make_sharded_train_step(cfg, mesh, chunk=n)
                sharded_steps[n] = fn
            return sharded_steps[n](state)

        _, mesh = make_sharded_train_step(cfg)  # build mesh eagerly
        state = shard_state(state, mesh)

    writer = MetricsWriter(workdir, echo=echo)
    history: list[dict] = []
    t_last = time.monotonic()

    def next_boundary(s: int) -> int:
        """First step > s where the host must look at the run."""
        cands = [num_steps]
        for every in (cfg.log_every, cfg.checkpoint_every, cfg.eval_every):
            if every:
                cands.append((s // every + 1) * every)
        return min(c for c in cands if c > s)

    step = int(state.step)
    steps_since_log = 0
    try:
        while step < num_steps:
            target = next_boundary(step)
            chunk = target - step
            # Chunked lax.scan execution amortises per-step dispatch
            # latency.  With default config the boundaries align so only
            # ONE chunk size (log_every) compiles — compiles are
            # expensive on TPU.
            if sharded:
                state, metrics = sharded_chunk(state, chunk)
            else:
                state, metrics = train_chunk(cfg, state, chunk)
            # The float() below is where the host actually blocks on the
            # async dispatch — keep it inside the try so an interrupt
            # here still checkpoints.
            last = {k: float(v[-1]) for k, v in metrics.items()}
            step = target
            steps_since_log += chunk

            if cfg.log_every and (step % cfg.log_every == 0
                                  or step == num_steps):
                now = time.monotonic()
                last["steps_per_sec"] = steps_since_log / max(
                    now - t_last, 1e-9)
                t_last = now
                steps_since_log = 0
                writer.write(step, last)
                history.append({"step": step, **last})
            if (workdir and cfg.checkpoint_every
                    and step % cfg.checkpoint_every == 0):
                ckpt.save_checkpoint(workdir, state)
            if (cfg.eval_every and step % cfg.eval_every == 0
                    and step < num_steps):
                eval_key = jax.random.fold_in(
                    jax.random.PRNGKey(cfg.seed + 1), step)
                ev = {k: float(v) for k, v in
                      evaluate(cfg, state, eval_key).items()}
                writer.write(step, ev, kind="eval")

        if workdir and cfg.checkpoint_every:
            ckpt.save_checkpoint(workdir, state)
    except KeyboardInterrupt:
        # Graceful stop (SURVEY.md §5 failure/resume).  `state` holds the
        # newest completed dispatch's OUTPUT, which is save-able; only if
        # the interrupt landed inside a dispatch itself does `state`
        # still name the donated input — then saving raises and we skip
        # it (the periodic checkpoint remains the resume point).
        if workdir and cfg.checkpoint_every:
            try:
                ckpt.save_checkpoint(workdir, state)
            except Exception:
                pass
        raise
    finally:
        writer.close()
    return state, history


def train_from_dataset(cfg: Config, dataset, num_epochs: int,
                       state: TrainState | None = None, prefetch: int = 2):
    """Train from a recorded host dataset (data/host_pipeline.py) instead
    of the on-device samplers — the reference's dataset-loading path
    (SURVEY.md §2 C9).  Batches stream through the async H2D prefetcher;
    each reaches the jitted externally-batched ``train_step``.

    ``dataset`` is an ArrayDataset whose arrays include ``conditions`` and
    ``real_traj``.  Returns (state, last_metrics).
    """
    import jax.numpy as jnp

    from ndivplanning_tpu.data.host_pipeline import epochs
    from ndivplanning_tpu.data.tasks import Batch
    from ndivplanning_tpu.envs.types import Scene
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.train.step import train_step

    if state is None:
        state = create_train_state(cfg)
    metrics = None
    dummy_scene = jax.vmap(lambda _: Scene.create([0.0, 0.0], [1.0, 1.0]))(
        jnp.zeros(cfg.batch_size))
    for host_batch in epochs(dataset, cfg.batch_size, num_epochs,
                             seed=cfg.seed, prefetch=prefetch):
        batch = Batch(
            conditions=jnp.asarray(host_batch["conditions"]),
            real_traj=jnp.asarray(host_batch["real_traj"]),
            scenes=dummy_scene,
        )
        state, metrics = train_step(cfg, state, batch)
    return state, metrics


def run_steps(cfg: Config, state: TrainState, n: int):
    """Run n fused steps without any logging/IO; returns (state, last_metrics).

    Utility for tests and benchmarks.
    """
    metrics = None
    for _ in range(n):
        state, metrics = train_step_fused(cfg, state)
    return state, metrics
