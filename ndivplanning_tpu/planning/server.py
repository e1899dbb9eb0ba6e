"""Planning server: JSON-lines request loop over a trained checkpoint.

The serving shape of sim-in-the-loop planning (SURVEY.md §3.3 as a
service): one process holds the compiled plan program (latents ->
generator -> 1k vmapped rollouts -> best/diverse selection) and answers
scene requests on stdin/stdout, one JSON object per line.

Request:  {"start": [x, y], "goal": [x, y],
           "obstacles": [[cx, cy, r], ...]}        (obstacles optional)
Response: {"best_traj": [[x, y] * horizon], "best_score": s,
           "best_reached": 0|1, "diverse_trajs": [...], "latency_ms": t}

The first request pays the compile; every later request is one dispatch
(all requests share one static shape: scenes are fixed-capacity pytrees).
"""

from __future__ import annotations

import json
import sys
import time
from typing import IO

import jax
import jax.numpy as jnp

from ndivplanning_tpu.data.scenes import rasterize_scene
from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.planning.planner import plan
from ndivplanning_tpu.train.state import TrainState
from ndivplanning_tpu.utils.config import Config


def _condition_for(cfg: Config, scene: Scene) -> jnp.ndarray:
    if cfg.conditioning == "image":
        return rasterize_scene(scene, size=cfg.image_size)
    if cfg.conditioning == "startgoal":
        return jnp.concatenate([scene.start, scene.goal])
    return jnp.zeros((0,), jnp.float32)


def handle_request(cfg: Config, state: TrainState, request: dict,
                   key: jax.Array, n_diverse: int = 4) -> dict:
    """Plan for one scene request; returns a JSON-serialisable response."""
    t0 = time.perf_counter()
    scene = Scene.create(request["start"], request["goal"],
                         request.get("obstacles"))
    condition = _condition_for(cfg, scene)
    result = plan(cfg, state, scene, condition, key, n_diverse=n_diverse)
    best = result.best_traj
    import numpy as np

    diverse = np.asarray(result.taus[result.diverse_idx])
    return {
        "best_traj": np.asarray(best).tolist(),
        "best_score": float(result.best_score),
        "best_reached": float(result.best_reached),
        "diverse_trajs": diverse.tolist(),
        "latency_ms": round((time.perf_counter() - t0) * 1e3, 2),
    }


def serve(cfg: Config, state: TrainState, stdin: IO[str] = sys.stdin,
          stdout: IO[str] = sys.stdout, seed: int = 0) -> int:
    """Blocking request loop; returns number of requests served."""
    key = jax.random.PRNGKey(seed)
    n = 0
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        if line == "quit":
            break
        try:
            request = json.loads(line)
            key, sub = jax.random.split(key)
            response = handle_request(cfg, state, request, sub)
        except Exception as e:  # noqa: BLE001 — server must not die per-request
            response = {"error": f"{type(e).__name__}: {e}"}
        stdout.write(json.dumps(response) + "\n")
        stdout.flush()
        n += 1
    return n
