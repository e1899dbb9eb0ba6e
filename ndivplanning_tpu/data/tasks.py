"""On-device synthetic task samplers (SURVEY.md §2 C9).

Each task is a pure function of a PRNG key producing a :class:`Batch` —
the TPU-native replacement for the reference's host-side dataset loading:
no host->device transfer in the train loop at all; the sampler is traced
into the jitted train step.

Multimodality by construction (the property NDiv must capture):
- ``pointmass2d``: trajectories head from the box centre to one of 8
  anchor modes on a circle (discrete modes; diversity = mode coverage).
- ``goalcond``: minimum-jerk start->goal paths with a left- OR
  right-detour (random sign & amplitude; two continuous mode families
  per condition).
- ``imagecond``/``planning``: random obstacle scenes; expert paths are
  quadratic Beziers whose control point detours perpendicular on a
  random side.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import flax.struct
import jax
import jax.numpy as jnp

from ndivplanning_tpu.data.scenes import random_scene_batch, rasterize_batch
from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.utils.config import Config


@flax.struct.dataclass
class Batch:
    """One training batch.

    Attributes:
      conditions: raw condition input for the ConditionEncoder —
        ``[B, 0]`` (none), ``[B, 4]`` (startgoal), ``[B, S, S, 3]`` (image).
      real_traj: ``[B, horizon, state_dim]`` expert trajectories.
      scenes: batched :class:`Scene` pytree (present for all modes; used
        by sim-in-the-loop eval).
    """

    conditions: jnp.ndarray
    real_traj: jnp.ndarray
    scenes: Scene


@dataclasses.dataclass(frozen=True)
class Task:
    """A task = a pure batch sampler plus its conditioning mode."""

    name: str
    conditioning: str
    sample: Callable[[jax.Array, int], Batch]  # (key, batch) -> Batch


def _timegrid(horizon: int) -> jnp.ndarray:
    """[H] time points in (0, 1], matching waypoint-rollout semantics."""
    return (jnp.arange(horizon, dtype=jnp.float32) + 1.0) / horizon


def _min_jerk(t: jnp.ndarray) -> jnp.ndarray:
    return 10.0 * t**3 - 15.0 * t**4 + 6.0 * t**5


def _detour_path(start, goal, t, side_amp):
    """Min-jerk start->goal path + perpendicular sine detour of signed
    amplitude ``side_amp``."""
    s = _min_jerk(t)[:, None]
    base = start[None, :] + s * (goal - start)[None, :]
    d = goal - start
    norm = jnp.sqrt(jnp.sum(d * d) + 1e-12)
    perp = jnp.stack([-d[1], d[0]]) / norm
    return base + (side_amp * jnp.sin(jnp.pi * t))[:, None] * perp[None, :]


# ------------------------------------------------------------ pointmass2d


def _sample_pointmass2d(key: jax.Array, batch: int, horizon: int,
                        n_modes: int = 8) -> Batch:
    k_mode, k_noise, k_amp = jax.random.split(key, 3)
    centre = jnp.array([0.5, 0.5])
    mode = jax.random.randint(k_mode, (batch,), 0, n_modes)
    angle = 2.0 * jnp.pi * mode.astype(jnp.float32) / n_modes
    goals = centre + 0.35 * jnp.stack([jnp.cos(angle), jnp.sin(angle)], -1)
    t = _timegrid(horizon)
    amp = 0.05 * jax.random.normal(k_amp, (batch,))
    traj = jax.vmap(lambda g, a: _detour_path(centre, g, t, a))(goals, amp)
    traj = traj + 0.01 * jax.random.normal(k_noise, traj.shape)
    scenes = jax.vmap(lambda g: Scene.create(centre, g))(goals)
    conditions = jnp.zeros((batch, 0), jnp.float32)
    return Batch(conditions=conditions, real_traj=traj, scenes=scenes)


# --------------------------------------------------------------- goalcond


def _sample_goalcond(key: jax.Array, batch: int, horizon: int) -> Batch:
    k_start, k_goal, k_side, k_amp, k_noise = jax.random.split(key, 5)
    start = jax.random.uniform(k_start, (batch, 2), minval=0.05, maxval=0.45)
    goal = jax.random.uniform(k_goal, (batch, 2), minval=0.55, maxval=0.95)
    side = 2.0 * jax.random.bernoulli(k_side, 0.5, (batch,)) - 1.0
    amp = side * jax.random.uniform(k_amp, (batch,), minval=0.05, maxval=0.25)
    t = _timegrid(horizon)
    traj = jax.vmap(lambda s, g, a: _detour_path(s, g, t, a))(start, goal, amp)
    traj = jnp.clip(traj + 0.005 * jax.random.normal(k_noise, traj.shape),
                    0.0, 1.0)
    conditions = jnp.concatenate([start, goal], axis=-1)
    scenes = jax.vmap(Scene.create)(start, goal)
    return Batch(conditions=conditions, real_traj=traj, scenes=scenes)


# -------------------------------------------------------------- imagecond


def _bezier(start, ctrl, goal, t):
    u = t[:, None]
    return ((1 - u) ** 2 * start[None, :] + 2 * (1 - u) * u * ctrl[None, :]
            + u**2 * goal[None, :])


def _sample_imagecond(key: jax.Array, batch: int, horizon: int,
                      image_size: int) -> Batch:
    k_scene, k_side, k_amp, k_noise = jax.random.split(key, 4)
    scenes = random_scene_batch(k_scene, batch)
    images = rasterize_batch(scenes, size=image_size)
    side = 2.0 * jax.random.bernoulli(k_side, 0.5, (batch,)) - 1.0
    amp = side * jax.random.uniform(k_amp, (batch,), minval=0.1, maxval=0.35)
    t = _timegrid(horizon)

    def expert(scene: Scene, a):
        d = scene.goal - scene.start
        norm = jnp.sqrt(jnp.sum(d * d) + 1e-12)
        perp = jnp.stack([-d[1], d[0]]) / norm
        ctrl = (scene.start + scene.goal) / 2.0 + a * perp
        return _bezier(scene.start, ctrl, scene.goal, t)

    traj = jax.vmap(expert)(scenes, amp)
    traj = jnp.clip(traj + 0.005 * jax.random.normal(k_noise, traj.shape),
                    0.0, 1.0)
    return Batch(conditions=images, real_traj=traj, scenes=scenes)


# --------------------------------------------------------------- registry


def task_fingerprint(cfg: Config) -> tuple:
    """EVERY Config field :func:`make_task` (and its samplers) read —
    the cache key for the frozen eval suite (train/evaluate.py).

    Lives next to make_task so a change to what the samplers consume is
    staring at the fingerprint it must extend; a stale fingerprint would
    silently serve one preset's "frozen" suite to another
    (tests/test_evaluate_plan.py pins the coupling).  env/rollout_mode
    entered in round 3 with action-space training: under
    ``rollout_mode="actions"`` the sampler distills expert waypoints into
    the env family's expert ACTION sequences, so both fields shape
    ``real_traj``."""
    return (cfg.conditioning, cfg.horizon, cfg.image_size, cfg.env,
            cfg.rollout_mode)


def _actionize(fn, env: str):
    """Wrap a waypoint-expert sampler for action-space training: distill
    each expert waypoint path into the env family's expert ACTION
    sequence via its own controller (envs/rollout.py::distill_actions) —
    dynamically consistent real data by construction, all on-device."""
    from ndivplanning_tpu.envs.registry import get_env
    from ndivplanning_tpu.envs.rollout import distill_actions

    def sample(key: jax.Array, batch: int) -> Batch:
        b = fn(key, batch)
        params = get_env(env).make_params()
        acts = jax.vmap(
            lambda sc, w: distill_actions(params, sc, w, env)
        )(b.scenes, b.real_traj)
        return Batch(conditions=b.conditions, real_traj=acts,
                     scenes=b.scenes)

    return sample


def make_task(cfg: Config) -> Task:
    """Build the task sampler for a config (SURVEY.md §3.4 init flow).

    Reads only the fields in :func:`task_fingerprint` — extend BOTH
    together."""
    horizon = cfg.horizon
    if cfg.conditioning == "none":
        fn = functools.partial(_sample_pointmass2d, horizon=horizon)
        name, conditioning = "pointmass2d", "none"
    elif cfg.conditioning == "startgoal":
        fn = functools.partial(_sample_goalcond, horizon=horizon)
        name, conditioning = "goalcond", "startgoal"
    elif cfg.conditioning == "image":
        fn = functools.partial(_sample_imagecond, horizon=horizon,
                               image_size=cfg.image_size)
        name, conditioning = "imagecond", "image"
    else:
        raise ValueError(f"unknown conditioning {cfg.conditioning!r}")
    if cfg.rollout_mode == "actions":
        # Under action mode the model's trajectory entries ARE actions,
        # so G's output width must equal the family's action dim.  The
        # first four families all have action_dim == 2 == the state_dim
        # default, which let this stay implicit; arm3 (action_dim = 3)
        # is why it is now checked (a mismatch otherwise surfaces as a
        # confusing matmul shape error deep inside the train step).
        from ndivplanning_tpu.envs.registry import action_dim

        du = action_dim(cfg.env)
        if cfg.state_dim != du:
            raise ValueError(
                f"rollout_mode='actions' with env {cfg.env!r} needs "
                f"state_dim == action_dim == {du} (trajectory entries "
                f"are actions), got state_dim={cfg.state_dim}")
        fn = _actionize(fn, cfg.env)
        name += "+actions"
    return Task(name=name, conditioning=conditioning, sample=fn)
