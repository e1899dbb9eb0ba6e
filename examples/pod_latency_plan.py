"""Pod latency planning: one scene's candidates sharded over a mesh.

    python examples/pod_latency_plan.py

Demonstrates the candidate-axis sharded planners
(`parallel/sharded_plan.py`): the single-scene 1000-candidate pipeline
split over every device of a `(dp, div)` mesh — the layout for a
latency-critical request on a pod, where scene-batching (`plan_batch`)
would leave all but one device idle.  Runs anywhere: when fewer than 8
real devices are present it uses the virtual 8-CPU-device trick the test
suite uses, so the sharding semantics are exercised for real.

All three planners ride the same construction and are numerically
identical to their unsharded versions (printed below): one-shot
(`make_sharded_plan`), CEM refinement (`make_sharded_cem`), and gradient
refinement (`make_sharded_grad`).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_devices(n: int = 8) -> None:
    import jax

    if len(jax.devices()) >= n:
        return
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()
    jax.config.update("jax_num_cpu_devices", n)


def main() -> None:
    _ensure_devices(8)
    import jax
    import jax.numpy as jnp

    from ndivplanning_tpu.data.scenes import random_scene
    from ndivplanning_tpu.parallel.mesh import make_mesh
    from ndivplanning_tpu.parallel.sharded_plan import (
        make_sharded_cem,
        make_sharded_grad,
        make_sharded_plan,
    )
    from ndivplanning_tpu.parallel.sharded_step import shard_state
    from ndivplanning_tpu.planning.cem import plan_cem
    from ndivplanning_tpu.planning.grad_refine import plan_grad
    from ndivplanning_tpu.planning.planner import plan
    from ndivplanning_tpu.train.state import create_train_state
    from ndivplanning_tpu.utils.config import get_config

    n_dev = len(jax.devices())
    cfg = get_config("goalcond", dp_shards=n_dev // 2, div_shards=2,
                     n_candidates=1000)
    mesh = make_mesh(cfg=cfg)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"on {jax.devices()[0].platform}")

    state = create_train_state(cfg)  # untrained — this demos the layout
    state_r = shard_state(state, mesh)
    scene = random_scene(jax.random.PRNGKey(0))
    cond = jnp.concatenate([scene.start, scene.goal], axis=-1)
    key = jax.random.PRNGKey(1)

    plan_fn, _ = make_sharded_plan(cfg, mesh)
    sharded = plan_fn(state_r, scene, cond, key)
    base = plan(cfg, state, scene, cond, key)
    print(f"one-shot: sharded best={float(sharded.best_score):.6f} "
          f"unsharded best={float(base.best_score):.6f} "
          f"taus sharding={sharded.taus.sharding.spec}")

    cem_fn, _ = make_sharded_cem(cfg, mesh, n_candidates=128, n_iters=3)
    (cs, _), (us, _) = (cem_fn(state_r, scene, cond, key),
                        plan_cem(cfg, state, scene, cond, key,
                                 n_candidates=128, n_iters=3))
    print(f"CEM:      sharded best={float(cs.best_score):.6f} "
          f"unsharded best={float(us.best_score):.6f}")

    grad_fn, _ = make_sharded_grad(cfg, mesh, n_candidates=64, n_steps=8)
    (gs, _), (gu, _) = (grad_fn(state_r, scene, cond, key),
                        plan_grad(cfg, state, scene, cond, key,
                                  n_candidates=64, n_steps=8))
    print(f"grad:     sharded best={float(gs.best_score):.6f} "
          f"unsharded best={float(gu.best_score):.6f}")


if __name__ == "__main__":
    main()
