"""Host-side data pipeline for external datasets (SURVEY.md §2 C9, L6).

The synthetic tasks run fully on-device; this module is the complementary
path for *recorded* datasets (e.g. expert trajectories dumped to ``.npz``)
— the rebuild of the reference's host dataset loading, TPU-style:
shuffled epoch sampling on the host, with an async prefetch iterator that
keeps the next batch's H2D copy in flight while the current step runs.
"""

from __future__ import annotations

import threading
import queue
from typing import Iterator, Mapping

import jax
import numpy as np


class ArrayDataset:
    """In-memory dataset of aligned arrays (conditions, trajectories, ...).

    All arrays share the leading example axis.  ``from_npz`` loads a file
    saved via ``np.savez(path, conditions=..., real_traj=...)``.
    """

    def __init__(self, arrays: Mapping[str, np.ndarray]):
        if not arrays:
            raise ValueError("empty dataset")
        sizes = {k: len(v) for k, v in arrays.items()}
        if len(set(sizes.values())) != 1:
            raise ValueError(f"misaligned leading axes: {sizes}")
        self.arrays = {k: np.asarray(v) for k, v in arrays.items()}
        self.size = next(iter(sizes.values()))

    @classmethod
    def from_npz(cls, path: str) -> "ArrayDataset":
        with np.load(path) as f:
            return cls({k: f[k] for k in f.files})

    def batch_indices(self, batch_size: int, *, seed: int = 0,
                      drop_remainder: bool = True) -> Iterator[np.ndarray]:
        """One shuffled epoch of example-index batches (deterministic in
        seed).  ``batches`` delegates here, so any consumer that gathers
        rows by these indices sees the EXACT batch order of the host
        stream — the device-resident dataset path (train/loop.py)
        depends on this being the single source of truth."""
        rng = np.random.default_rng(seed)
        order = rng.permutation(self.size)
        stop = (self.size // batch_size) * batch_size if drop_remainder \
            else self.size
        for i in range(0, stop, batch_size):
            yield order[i:i + batch_size]

    def batches(self, batch_size: int, *, seed: int = 0,
                drop_remainder: bool = True) -> Iterator[dict]:
        """One shuffled epoch of host batches (deterministic in seed)."""
        for idx in self.batch_indices(batch_size, seed=seed,
                                      drop_remainder=drop_remainder):
            yield {k: v[idx] for k, v in self.arrays.items()}


def prefetch_to_device(iterator: Iterator, buffer_size: int = 2,
                       device=None) -> Iterator:
    """Async H2D prefetch: a daemon thread stages ``buffer_size`` batches
    (any pytree of host arrays) onto the device ahead of the consumer
    (double buffering by default), overlapping host batch prep + transfer
    with device compute.

    A producer-side failure (corrupt record, device OOM) is re-raised in
    the consumer rather than silently truncating the stream.
    """
    q: queue.Queue = queue.Queue(maxsize=buffer_size)
    sentinel = object()

    def producer():
        try:
            for batch in iterator:
                q.put(jax.device_put(batch, device))
            q.put(sentinel)
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            q.put(e)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def epochs(dataset: ArrayDataset, batch_size: int, num_epochs: int,
           *, seed: int = 0, prefetch: int = 2) -> Iterator[dict]:
    """Multi-epoch prefetched stream; epoch e reshuffles with seed+e."""

    def host_stream():
        for e in range(num_epochs):
            yield from dataset.batches(batch_size, seed=seed + e)

    yield from prefetch_to_device(host_stream(), buffer_size=prefetch)


def scenes_from_arrays(arrays: Mapping[str, np.ndarray], conditioning: str):
    """Build a batched :class:`~ndivplanning_tpu.envs.types.Scene` pytree
    (host numpy leaves) from dataset arrays.

    Prefers the recorded ``scene_*`` ground truth (written by
    :func:`record_dataset`).  For legacy datasets without scenes, a
    start/goal-conditioned scene can be reconstructed exactly from the
    conditions ONLY when the task is obstacle-free (the goalcond task);
    anything else raises rather than silently evaluating against wrong
    scenes.
    """
    from ndivplanning_tpu.envs.types import MAX_OBSTACLES, Scene

    if "scene_start" in arrays:
        return Scene(
            start=np.asarray(arrays["scene_start"], np.float32),
            goal=np.asarray(arrays["scene_goal"], np.float32),
            obstacles=np.asarray(arrays["scene_obstacles"], np.float32),
            obstacle_mask=np.asarray(arrays["scene_obstacle_mask"],
                                     np.float32),
        )
    if conditioning == "startgoal":
        c = np.asarray(arrays["conditions"], np.float32)
        b = len(c)
        return Scene(
            start=c[:, :2],
            goal=c[:, 2:4],
            obstacles=np.zeros((b, MAX_OBSTACLES, 3), np.float32),
            obstacle_mask=np.zeros((b, MAX_OBSTACLES), np.float32),
        )
    raise ValueError(
        "dataset has no scene_* arrays and scenes cannot be reconstructed "
        f"from conditioning={conditioning!r}; re-record with "
        "record_dataset (which saves scene ground truth)"
    )


def train_eval_split(dataset: ArrayDataset, eval_fraction: float,
                     *, seed: int = 0) -> tuple[ArrayDataset, ArrayDataset]:
    """Deterministic shuffled split into (train, heldout-eval) datasets."""
    if not 0.0 < eval_fraction < 1.0:
        raise ValueError(f"eval_fraction must be in (0,1), got {eval_fraction}")
    rng = np.random.default_rng(seed)
    order = rng.permutation(dataset.size)
    n_eval = max(1, int(round(dataset.size * eval_fraction)))
    ev, tr = order[:n_eval], order[n_eval:]
    return (ArrayDataset({k: v[tr] for k, v in dataset.arrays.items()}),
            ArrayDataset({k: v[ev] for k, v in dataset.arrays.items()}))


def record_dataset(cfg, n_examples: int, path: str, *, seed: int = 0,
                   filter_collisions: bool = True) -> dict:
    """Record a dataset from the on-device task sampler to ``path`` (npz),
    validating expert trajectories with the native C++ collision checker
    (data/native.py) and dropping colliding ones.

    Returns {"kept": int, "dropped": int}.  The recorded file round-trips
    through :class:`ArrayDataset.from_npz` into
    ``train.loop.train_from_dataset``.
    """
    import jax

    from ndivplanning_tpu.data.native import collision_mask_host
    from ndivplanning_tpu.data.tasks import make_task

    task = make_task(cfg)
    batch = task.sample(jax.random.PRNGKey(seed), n_examples)
    conditions = np.asarray(batch.conditions)
    trajs = np.asarray(batch.real_traj)
    obstacles = np.asarray(batch.scenes.obstacles)
    obstacle_mask = np.asarray(batch.scenes.obstacle_mask)
    if filter_collisions:
        hit = collision_mask_host(trajs, obstacles, obstacle_mask)
        keep = hit == 0
    else:
        keep = np.ones(len(trajs), bool)
    # The scene ground truth rides along so a dataset-trained run can be
    # honestly evaluated (rollout success/collision need the TRUE scenes,
    # not reconstructions).
    np.savez(
        path,
        conditions=conditions[keep],
        real_traj=trajs[keep],
        scene_start=np.asarray(batch.scenes.start)[keep],
        scene_goal=np.asarray(batch.scenes.goal)[keep],
        scene_obstacles=obstacles[keep],
        scene_obstacle_mask=obstacle_mask[keep],
    )
    return {"kept": int(keep.sum()), "dropped": int((~keep).sum())}
