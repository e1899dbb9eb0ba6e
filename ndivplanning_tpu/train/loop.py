"""Host-side training loop (SURVEY.md §3.1 outer loop, C13 wiring).

The loop's only jobs are: call the fused jitted step, surface metrics at
log intervals (a single device->host transfer of four scalars — the step
itself never blocks), checkpoint every N steps, and restore-on-start so a
killed run resumes its exact bitwise loss curve (SURVEY.md §5).
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.train.evaluate import evaluate_fixed
from ndivplanning_tpu.train.state import TrainState, create_train_state
from ndivplanning_tpu.train.step import train_chunk, train_step_fused
from ndivplanning_tpu.utils import checkpoint as ckpt
from ndivplanning_tpu.utils.config import Config
from ndivplanning_tpu.utils.metrics import MetricsWriter


def _dataset_marker_path(workdir: str) -> str:
    return os.path.join(workdir, "dataset_run.json")


def _dataset_fingerprint(dataset, cfg: Config) -> dict:
    import hashlib

    # Content hash, not just shape: two same-shaped recordings (e.g. a
    # re-recorded npz with another seed) must NOT be resumable into each
    # other's workdir — the step counter is a position in ONE dataset's
    # deterministic batch order.  Recorded datasets are MB-scale, so
    # hashing the full bytes is cheap (one-time at loop start).
    h = hashlib.blake2b(digest_size=16)
    for name in sorted(dataset.arrays):
        a = np.ascontiguousarray(dataset.arrays[name])
        h.update(name.encode())
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return {"dataset_size": int(dataset.size),
            "batch_size": int(cfg.batch_size),
            "seed": int(cfg.seed),
            "arrays": sorted(dataset.arrays),
            "content_blake2b": h.hexdigest()}


def _write_dataset_marker(workdir: str, dataset, cfg: Config) -> None:
    import json

    os.makedirs(workdir, exist_ok=True)
    with open(_dataset_marker_path(workdir), "w", encoding="utf-8") as f:
        json.dump(_dataset_fingerprint(dataset, cfg), f)


def _check_dataset_marker(workdir: str, dataset, cfg: Config) -> None:
    import json

    path = _dataset_marker_path(workdir)
    if not os.path.exists(path):
        raise ValueError(
            f"workdir {workdir!r} holds a checkpoint but no dataset-run "
            "marker: it was trained by a different path (e.g. the "
            "on-device sampler), and its step counter cannot be used as "
            "a position in this dataset. Use a fresh --workdir or "
            "restore=False.")
    with open(path, encoding="utf-8") as f:
        marker = json.load(f)
    want = _dataset_fingerprint(dataset, cfg)
    # Compare only the keys the stored marker HAS: markers written before
    # a fingerprint field existed (e.g. content_blake2b) must stay
    # resumable against the identical dataset — strict dict equality
    # would reject every pre-change workdir (ADVICE round 2).
    mismatch = {k: (marker[k], want.get(k))
                for k in marker if marker[k] != want.get(k)}
    if mismatch:
        raise ValueError(
            f"workdir {workdir!r} was trained on a different dataset "
            f"run (mismatched fields: {mismatch}); resuming would "
            "misalign the deterministic batch order. Use a fresh "
            "--workdir.")
    # A legacy marker verified compatible on its own keys needs no
    # explicit backfill here: train_from_dataset unconditionally rewrites
    # the marker (with the full current fingerprint) right after this
    # check passes.


# Metrics where smaller is better; everything else is maximised by the
# best-checkpoint tracker.
_LOWER_BETTER = frozenset({
    "eval_endpoint_err", "eval_collision_rate", "eval_ndiv",
    "eval_mean_score", "eval_plan_best_score",
})


def _improved(name: str, value: float, best: Optional[float]) -> bool:
    import math

    # A NaN metric must never win (and must never become the bar that
    # every later finite value fails to clear — NaN comparisons are all
    # False, which would freeze the tracker for the rest of the run).
    if value is None or not math.isfinite(value):
        return False
    if best is None or not math.isfinite(best):
        return True
    return value < best if name in _LOWER_BETTER else value > best


def _load_best_metric(workdir: Optional[str], cfg: Config) -> Optional[float]:
    """The tracked metric's value recorded in <workdir>/best/best_path.json,
    or None.  Loaded at loop start so a RESUMED run's tracker continues
    from the already-saved best instead of letting the first post-resume
    eval (possibly an oscillation trough) overwrite a better artifact."""
    import json

    if not workdir or not cfg.track_best_metric:
        return None
    path = os.path.join(workdir, "best", "best_path.json")
    try:
        with open(path, encoding="utf-8") as f:
            marker = json.load(f)
    except (OSError, ValueError):
        return None
    if marker.get("metric") != cfg.track_best_metric:
        return None
    value = marker.get("value")
    return float(value) if isinstance(value, (int, float)) else None


def _write_best_marker(best_dir: str, eval_path: str, metric: str,
                       value: float, step: int) -> None:
    """Record which generator weights (raw vs EMA) the best checkpoint's
    winning eval used — observability for the best-of-both selection."""
    import json

    os.makedirs(best_dir, exist_ok=True)
    with open(os.path.join(best_dir, "best_path.json"), "w",
              encoding="utf-8") as f:
        json.dump({"eval_path": eval_path, "metric": metric,
                   "value": value, "step": step}, f)


def _best_candidates(cfg: Config, state: TrainState, ev: dict,
                     raw_eval_fn=None):
    """The (eval_path, metric_value, state_to_save) candidates for the
    best-checkpoint tracker at one eval point.

    With EMA tracking on, the raw generator is evaluated too (via
    ``raw_eval_fn() -> metrics dict``): the EMA curve is smoother but
    its peak can sit BELOW the raw generator's best oscillation
    (goalcond measured 0.589 EMA-best vs 0.674 raw-best, BASELINE.md
    round 2), so the best checkpoint is selected over BOTH paths.  A raw
    win is saved with ``g_ema_params`` replaced by the raw weights, so
    every consumer (eval/plan/serve read the EMA slot via
    ``gen_params``) automatically serves the winning weights; the
    ``best_path.json`` marker records which path won.  Best checkpoints
    are consumption artifacts — training resume uses the periodic
    <workdir> checkpoints, never <workdir>/best.
    """
    track = cfg.track_best_metric
    if not track:
        return []
    candidates = [("ema" if cfg.g_ema_decay > 0 else "raw",
                   ev.get(track), state,
                   ev.get("eval_mean_pairwise_dist"))]
    if cfg.g_ema_decay > 0 and raw_eval_fn is not None:
        ev_raw = raw_eval_fn()
        raw_val = float(ev_raw[track]) if track in ev_raw else None
        if raw_val is not None:
            ev["raw_" + track] = raw_val
        candidates.append(
            ("raw", raw_val, state.replace(g_ema_params=state.g_params),
             ev_raw.get("eval_mean_pairwise_dist")))
    return candidates


def _track_best(cfg: Config, workdir, step: int, candidates,
                best_metric):
    """Save <workdir>/best when the winning candidate improves on
    ``best_metric``; returns the updated best.  ONE save per eval point:
    orbax skips a second save at an existing step, so the winning path
    is picked before saving."""
    winner = None
    for eval_path, metric, cand_state, div in candidates:
        if metric is None:
            continue
        # Diversity disqualifier (config.py best_min_diversity): a
        # candidate that beat the metric by collapsing multimodality
        # must not become the artifact consumers serve — the expert-
        # iteration fine-tune measured exactly that failure (success up,
        # mean pairwise distance 0.56 -> 0.04).  Off (0.0) by default.
        if (cfg.best_min_diversity > 0 and div is not None
                and div < cfg.best_min_diversity):
            continue
        if _improved(cfg.track_best_metric, metric,
                     winner[1] if winner else None):
            winner = (eval_path, metric, cand_state)
    if (workdir and winner is not None
            and _improved(cfg.track_best_metric, winner[1], best_metric)):
        best_metric = winner[1]
        best_dir = os.path.join(workdir, "best")
        # overwrite=True: a resumed run can re-reach a step that already
        # has a best checkpoint (best saved after the last periodic
        # checkpoint, then crash); without it orbax skips the save while
        # best_path.json is rewritten — marker/weights inconsistency.
        ckpt.save_checkpoint(best_dir, winner[2], overwrite=True)
        _write_best_marker(best_dir, winner[0], cfg.track_best_metric,
                           winner[1], step)
    return best_metric


class _LoopObserver:
    """The host-side bookkeeping both training loops share: chunk
    boundaries, log cadence (steps/sec + JSONL row), checkpoint cadence,
    frozen/held-out eval with best-of-both checkpoint tracking, and the
    interrupt-safe final save.  The loops differ only in how they
    produce chunks of steps (on-device sampler scan vs host-batch
    stream); everything that happens AT a boundary lives here once —
    the best-metric-resume bug existed twice before this.

    ``eval_fn(state, step, use_ema) -> {metric: float}`` or None to
    disable eval (the dataset loop without a held-out slice).
    """

    def __init__(self, cfg: Config, workdir: Optional[str],
                 total_steps: int, writer: MetricsWriter, eval_fn=None):
        self.cfg = cfg
        self.workdir = workdir
        self.total = total_steps
        self.writer = writer
        self.eval_fn = eval_fn
        self.history: list[dict] = []
        self.best_metric = _load_best_metric(workdir, cfg)
        self.t_last = time.monotonic()
        self.steps_since_log = 0

    def next_boundary(self, s: int) -> int:
        """First step > s where the host must look at the run."""
        cfg = self.cfg
        cands = [self.total]
        for every in (cfg.log_every, cfg.checkpoint_every, cfg.eval_every):
            if every:
                cands.append((s // every + 1) * every)
        return min(c for c in cands if c > s)

    def at_boundary(self, state: TrainState, step: int, n: int,
                    last: dict) -> None:
        """Log/checkpoint/eval actions after a chunk of ``n`` steps
        landed the run at ``step``; ``last`` is the newest metrics row
        (mutated in place to add steps_per_sec)."""
        cfg = self.cfg
        self.steps_since_log += n
        if cfg.log_every and (step % cfg.log_every == 0
                              or step >= self.total):
            now = time.monotonic()
            last["steps_per_sec"] = self.steps_since_log / max(
                now - self.t_last, 1e-9)
            self.t_last = now
            self.steps_since_log = 0
            self.writer.write(step, last)
            self.history.append({"step": step, **last})
        if (self.workdir and cfg.checkpoint_every
                and step % cfg.checkpoint_every == 0):
            ckpt.save_checkpoint(self.workdir, state)
        # The final step evals too (not just eval_every multiples):
        # otherwise a run whose quality peaks in its last window can
        # never win best-checkpoint selection, and short dataset runs
        # (total < eval_every) would never eval at all.
        if (self.eval_fn is not None and cfg.eval_every
                and (step % cfg.eval_every == 0 or step >= self.total)):
            ev = self.eval_fn(state, step, True)
            # Best-of-both selection (raw + EMA, _best_candidates) — the
            # candidates are computed BEFORE the writer call so the eval
            # row carries the raw path's tracked metric too.
            candidates = _best_candidates(
                cfg, state, ev,
                raw_eval_fn=lambda: self.eval_fn(state, step, False))
            self.writer.write(step, ev, kind="eval")
            self.best_metric = _track_best(cfg, self.workdir, step,
                                           candidates, self.best_metric)

    def final_save(self, state: TrainState) -> None:
        if self.workdir and self.cfg.checkpoint_every:
            ckpt.save_checkpoint(self.workdir, state)

    def interrupt_save(self, state: TrainState) -> None:
        """Graceful-stop save (SURVEY.md §5 failure/resume).  ``state``
        holds the newest completed dispatch's OUTPUT, which is save-able;
        only if the interrupt landed inside a dispatch does ``state``
        still name the donated input — then saving raises and we skip it
        (the periodic checkpoint remains the resume point)."""
        if self.workdir and self.cfg.checkpoint_every:
            try:
                ckpt.save_checkpoint(self.workdir, state)
            except Exception:
                pass


def train(cfg: Config, num_steps: Optional[int] = None,
          workdir: Optional[str] = None, restore: bool = True,
          echo: bool = True):
    """Train an NDiv-GAN per ``cfg``.

    ``workdir=None`` (the default) means ``cfg.workdir`` — the
    per-preset scratch dir unless overridden; pass ``""`` to disable
    checkpoints/metrics/restore entirely (tests, throwaway runs).

    Returns (final_state, history) where history is the list of logged
    metric rows (used by the determinism tests).
    """
    from ndivplanning_tpu.utils.compile_guard import start_compile_count

    num_steps = cfg.steps if num_steps is None else num_steps
    workdir = cfg.workdir if workdir is None else workdir

    # Count every XLA program this run compiles, init included — major
    # ones cost 90-300 s each on the TPU tunnel (logged at run end).
    compile_rec, stop_compile_count = start_compile_count()

    state = create_train_state(cfg)
    if restore and workdir:
        restored = ckpt.restore_latest(workdir, state)
        if restored is not None:
            state = restored
    if workdir:
        # Record the config so eval/plan/serve rebuild the same
        # TrainState schema without retyping flags (utils/config.py).
        from ndivplanning_tpu.utils.config import save_config

        save_config(cfg, workdir)

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
    # Frozen-suite eval: step-to-step comparable numbers (sampled eval
    # is available via evaluate()).
    obs = _LoopObserver(
        cfg, workdir, num_steps, writer,
        eval_fn=lambda state, step, use_ema: {
            k: float(v) for k, v in evaluate_fixed(
                cfg, state, n_scenes=cfg.eval_suite_scenes,
                use_ema=use_ema).items()})

    step = int(state.step)
    try:
        while step < num_steps:
            target = obs.next_boundary(step)
            chunk = target - step
            # Chunked lax.scan execution amortises per-step dispatch
            # latency.  With default config the boundaries align so
            # only ONE chunk size (log_every) compiles — compiles
            # are expensive on TPU (90-300 s each on the tunnel).
            if sharded:
                state, metrics = sharded_chunk(state, chunk)
            else:
                state, metrics = train_chunk(cfg, state, chunk)
            # The float() below is where the host actually blocks on
            # the async dispatch — keep it inside the try so an
            # interrupt here still checkpoints.
            last = {k: float(v[-1]) for k, v in metrics.items()}
            step = target
            obs.at_boundary(state, step, chunk, last)

        # Compile-budget log (one line): how many XLA programs this run
        # actually compiled — major ones cost 90-300 s each on the TPU
        # tunnel, so regressions here matter as much as steps/sec.
        stop_compile_count()
        writer.write(step, {
            "xla_programs_compiled": compile_rec.count,
            "xla_major_programs": len(compile_rec.major()),
            "xla_compile_secs": round(compile_rec.total_secs(), 2),
        }, kind="compile")
        obs.final_save(state)
    except KeyboardInterrupt:
        obs.interrupt_save(state)
        raise
    finally:
        stop_compile_count()
        writer.close()
    return state, obs.history


def _make_dataset_chunk_step(cfg: Config, mesh=None):
    """Jitted ``(state, batches) -> (state, metrics)`` scanning
    ``train_step_impl`` over a ``[chunk, B, ...]`` stack of host batches —
    the dataset path's dispatch-latency amortiser (one compiled program
    per chunk size, same as ``train_chunk``).  With ``mesh``, batch
    leaves are constrained ``P('dp')``, latents ``P('dp','div')``, and
    the fused-kernel NDiv sub-region engages (train/step.py ``_ndiv``).
    """
    import functools

    from ndivplanning_tpu.train.step import train_step_impl

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ndivplanning_tpu.parallel.mesh import DIV_AXIS, DP_AXIS

        batch_sh = NamedSharding(mesh, P(DP_AXIS))
        z_sh = NamedSharding(mesh, P(DP_AXIS, DIV_AXIS))
        repl = NamedSharding(mesh, P())

    def body(state, batch):
        if mesh is not None:
            batch = jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, batch_sh),
                batch)
            new_state, metrics = train_step_impl(cfg, state, batch,
                                                 z_sharding=z_sh, mesh=mesh)
            new_state = jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, repl),
                new_state)
        else:
            new_state, metrics = train_step_impl(cfg, state, batch)
        return new_state, metrics

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chunk_step(state, batches):
        return jax.lax.scan(body, state, batches)

    return chunk_step


def train_from_dataset(cfg: Config, dataset, num_epochs: int,
                       state: TrainState | None = None, prefetch: int = 2,
                       workdir: Optional[str] = None, restore: bool = True,
                       echo: bool = False, eval_dataset=None,
                       eval_suite: bool = False):
    """Train from a recorded host dataset (data/host_pipeline.py) instead
    of the on-device samplers — the reference's dataset-loading path
    (SURVEY.md §2 C9), at full parity with :func:`train`:

    - true recorded scenes (or an exact obstacle-free reconstruction for
      startgoal datasets) ride along in every batch,
    - metrics stream through :class:`MetricsWriter`, checkpoints save on
      ``cfg.checkpoint_every`` and restore-on-start resumes the exact
      batch order (the epoch stream is deterministic in ``cfg.seed``, so
      the resumed run skips the consumed prefix and continues bitwise),
    - ``eval_dataset`` (e.g. from ``train_eval_split``) runs the honest
      held-out evaluation — rollout success/collision against the eval
      slice's TRUE scenes — every ``cfg.eval_every`` steps,
    - execution is chunked: host batches are stacked and scanned in one
      compiled program per log interval, and multi-shard configs route
      through the mesh (GSPMD constraints + fused-kernel NDiv),
    - datasets that fit ``NDIV_DATASET_DEVICE_MB`` (default 512 MB;
      0 disables) are uploaded to the device ONCE and chunks gather
      rows on device from int32 index batches — bitwise the same batch
      stream, without re-sending the arrays every epoch (the streaming
      path costs ~dataset_bytes x num_epochs over the TPU tunnel).

    ``dataset`` is an ArrayDataset with ``conditions``/``real_traj`` (and
    ``scene_*`` when recorded).  Returns (state, last_metrics_dict).

    ``eval_suite=True`` evaluates on the FROZEN task-sampler suite
    (evaluate_fixed) instead of a held-out dataset slice — the expert-
    iteration fine-tune path (train/distill.py), where the quantity being
    optimised is frozen-suite one-shot quality, not fit to the recorded
    expert set.  Mutually exclusive with ``eval_dataset``.
    """
    from ndivplanning_tpu.data.host_pipeline import (
        prefetch_to_device,
        scenes_from_arrays,
    )
    from ndivplanning_tpu.data.tasks import Batch
    from ndivplanning_tpu.train.evaluate import evaluate_on_batch

    steps_per_epoch = dataset.size // cfg.batch_size
    if steps_per_epoch == 0:
        raise ValueError(
            f"dataset of {dataset.size} examples is smaller than one "
            f"batch ({cfg.batch_size})")
    total_steps = num_epochs * steps_per_epoch

    if state is None:
        state = create_train_state(cfg)
    if restore and workdir:
        restored = ckpt.restore_latest(workdir, state)
        if restored is not None:
            # state.step is interpreted as a POSITION in this dataset's
            # deterministic batch order; a checkpoint from some other
            # run (e.g. the sampler path) would silently skip data or
            # no-op, so refuse anything the marker doesn't vouch for.
            _check_dataset_marker(workdir, dataset, cfg)
            state = restored

    mesh = None
    if cfg.dp_shards * cfg.div_shards > 1:
        from ndivplanning_tpu.parallel.mesh import make_mesh
        from ndivplanning_tpu.parallel.sharded_step import shard_state

        mesh = make_mesh(cfg=cfg)
        state = shard_state(state, mesh)
    if workdir:
        from ndivplanning_tpu.utils.config import save_config

        _write_dataset_marker(workdir, dataset, cfg)
        save_config(cfg, workdir)
    # One jitted chunk fn: jit re-specialises per stack shape on its own,
    # so no per-chunk-size bookkeeping is needed here.
    run_chunk = _make_dataset_chunk_step(cfg, mesh)

    def to_batch(host: dict) -> Batch:
        return Batch(
            conditions=np.asarray(host["conditions"], np.float32),
            real_traj=np.asarray(host["real_traj"], np.float32),
            scenes=scenes_from_arrays(host, cfg.conditioning),
        )

    eval_batch = None
    if eval_dataset is not None:
        n_eval = (eval_dataset.size // cfg.batch_size) * cfg.batch_size
        n_eval = n_eval or eval_dataset.size
        eval_batch = jax.device_put(to_batch(
            {k: v[:n_eval] for k, v in eval_dataset.arrays.items()}))

    step = int(state.step)
    if step >= total_steps:
        return state, {}
    start_step = step  # frozen: the generator must not see `step` advance

    writer = MetricsWriter(workdir, echo=echo)
    eval_fn = None
    if eval_suite:
        if eval_dataset is not None:
            raise ValueError("eval_suite and eval_dataset are mutually "
                             "exclusive — pick one eval protocol")

        def eval_fn(state, step, use_ema):
            return {k: float(v) for k, v in evaluate_fixed(
                cfg, state, n_scenes=cfg.eval_suite_scenes,
                use_ema=use_ema).items()}
    elif eval_batch is not None:
        def eval_fn(state, step, use_ema):
            # Honest held-out eval against the eval slice's TRUE scenes.
            # FIXED latent key (not folded with step): per-step draws
            # would make the best-of tracker select on latent-draw luck
            # instead of generator quality — the same frozen-eval
            # discipline train() gets from evaluate_fixed.
            eval_key = jax.random.PRNGKey(cfg.seed + 1)
            return {k: float(v) for k, v in evaluate_on_batch(
                cfg, state, eval_key, eval_batch,
                use_ema=use_ema).items()}
    obs = _LoopObserver(cfg, workdir, total_steps, writer, eval_fn=eval_fn)
    next_boundary = obs.next_boundary

    def batch_stream():
        """SINGLE host batches, skipping the resumed run's consumed
        prefix.  Per-batch granularity is the host-memory fix (round-2
        verdict weak #3): the old stream stacked a whole log interval of
        batches on the host before one device_put — ~1.3 GB per chunk at
        imagecond defaults (b512 images x log_every 50, x2 prefetch
        buffers).  Streaming single batches through the async prefetcher
        keeps host residency at ~(prefetch+1) batches; the chunk stack
        happens ON DEVICE below, where the stacked chunk lived anyway."""
        produced = 0
        for e in range(num_epochs):
            for host in dataset.batches(cfg.batch_size, seed=cfg.seed + e):
                if produced < start_step:  # consumed before the restart
                    produced += 1
                    continue
                produced += 1
                yield to_batch(host)

    def index_stream():
        """Device-resident twin of batch_stream: yields the SAME batch
        order as example-index arrays (ArrayDataset.batch_indices is the
        shared source of truth), so the two paths are bitwise
        interchangeable."""
        produced = 0
        for e in range(num_epochs):
            for idx in dataset.batch_indices(cfg.batch_size,
                                             seed=cfg.seed + e):
                if produced < start_step:
                    produced += 1
                    continue
                produced += 1
                yield idx.astype(np.int32)

    def run_pending(state, pending):
        batch_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *pending)
        return run_chunk(state, batch_stack)

    # Device-resident dataset path (round-5): the streaming path re-sends
    # the whole dataset host->device EVERY epoch — on a long fine-tune
    # from a small recorded set (100k steps over 27k planning512 rows =
    # ~1.9k epochs) that is ~600 GB through a ~tens-of-MB/s TPU tunnel,
    # and the soak becomes transfer-bound.  When the full converted
    # dataset fits a device-byte budget (NDIV_DATASET_DEVICE_MB, default
    # 512; 0 disables) and the config is unsharded, upload it ONCE and
    # gather each chunk's rows on device from tiny int32 index batches —
    # identical values in the same batch order (batch_indices is shared
    # with the host stream), so run_chunk sees bitwise-equal stacks.
    # Sharded configs keep the streaming path (per-shard device_put).
    full_batch = None
    ds_bytes = sum(v.nbytes for v in dataset.arrays.values())
    dev_mb = int(os.environ.get("NDIV_DATASET_DEVICE_MB", "512"))
    if mesh is None and dev_mb > 0 and ds_bytes <= (dev_mb << 20):
        full_batch = jax.device_put(to_batch(dataset.arrays))

    def run_pending_gather(state, pending):
        idx = jnp.asarray(np.stack(pending))  # [chunk, batch] int32
        batch_stack = jax.tree.map(lambda a: a[idx], full_batch)
        return run_chunk(state, batch_stack)

    last: dict = {}
    pending: list = []
    s = start_step
    target = next_boundary(s)
    # Device-memory cap on the pending stack (round-4 fix): boundaries
    # come from log/eval/checkpoint cadences, and a recorded config from
    # a long soak can carry log_every=5000 — at imagecond batch shapes
    # that is ~30 GB of stacked device batches before the first chunk
    # runs (measured RESOURCE_EXHAUSTED on the planning512 distill
    # fine-tune).  Flush whenever the stack reaches ~512 MB; mid-
    # interval flushes go through the same observer (its actions are
    # cadence-gated, steps/sec accumulation stays correct).
    chunk_cap: int | None = None
    if full_batch is not None:
        row_bytes = sum(
            leaf.nbytes for leaf in jax.tree.leaves(full_batch))
        batch_bytes = (row_bytes // max(dataset.size, 1)) * cfg.batch_size
        cap_mb = int(os.environ.get("NDIV_DATASET_CHUNK_MB", "512"))
        chunk_cap = max(1, (cap_mb << 20) // max(batch_bytes, 1))
        stream = index_stream()
        runner = run_pending_gather
    else:
        stream = prefetch_to_device(batch_stream(), buffer_size=prefetch)
        runner = run_pending
    try:
        for dev_batch in stream:
            pending.append(dev_batch)
            s += 1
            if chunk_cap is None:
                batch_bytes = sum(
                    leaf.nbytes for leaf in jax.tree.leaves(dev_batch))
                cap_mb = int(os.environ.get("NDIV_DATASET_CHUNK_MB",
                                            "512"))
                chunk_cap = max(1, (cap_mb << 20) // max(batch_bytes, 1))
            if s < target and len(pending) < chunk_cap:
                continue
            n = len(pending)
            state, metrics = runner(state, pending)
            pending = []
            if s >= target:
                target = next_boundary(s)
            last = {k: float(v[-1]) for k, v in metrics.items()}
            step += n
            obs.at_boundary(state, step, n, last)
        if pending:  # dataset truncation (drop_remainder) tail
            n = len(pending)
            state, metrics = runner(state, pending)
            last = {k: float(v[-1]) for k, v in metrics.items()}
            step += n
            obs.at_boundary(state, step, n, last)

        obs.final_save(state)
    except KeyboardInterrupt:
        obs.interrupt_save(state)
        raise
    finally:
        writer.close()
    return state, last


def run_steps(cfg: Config, state: TrainState, n: int):
    """Run n fused steps without any logging/IO; returns (state, last_metrics).

    Utility for tests and benchmarks.
    """
    metrics = None
    for _ in range(n):
        state, metrics = train_step_fused(cfg, state)
    return state, metrics
