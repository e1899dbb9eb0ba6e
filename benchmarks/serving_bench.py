"""Serving latency/throughput benchmark (SURVEY.md §3.3 as-a-service).

Measures, on the live backend, the planning server's request path
(`handle_batch`: scene build -> bucketed plan_batch dispatch -> host
transfer) for single requests and 16-scene bursts:

    python benchmarks/serving_bench.py [n_iters]

Prints one JSON line with p50/p95 latency and QPS per mode.  All
timings end in the host transfer handle_batch already performs
(np.asarray of every output), which is the honest sync point on the
axon tunnel.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from ndivplanning_tpu.planning.server import handle_batch
from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.utils.config import get_config


def _requests(n: int) -> list[dict]:
    rng = np.random.default_rng(0)
    out = []
    for _ in range(n):
        s, g = rng.uniform(0.05, 0.3, 2), rng.uniform(0.7, 0.95, 2)
        out.append({"start": s.tolist(), "goal": g.tolist(),
                    "obstacles": [[0.5, 0.5, 0.1]]})
    return out


def bench_mode(cfg, state, batch: int, n_iters: int) -> dict:
    key = jax.random.PRNGKey(0)
    reqs = _requests(batch)
    # Warm the bucket's compile out of the measurement.
    handle_batch(cfg, state, reqs, key)
    lat = []
    for i in range(n_iters):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        out = handle_batch(cfg, state, reqs, sub)
        lat.append(time.perf_counter() - t0)
        assert len(out) == batch
    lat_ms = np.asarray(lat) * 1e3
    total_s = float(np.sum(lat))
    return {
        "batch": batch,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
        "qps": round(batch * n_iters / total_s, 1),
    }


def main() -> None:
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cfg = get_config("planning")
    state = create_train_state(cfg)
    result = {
        "backend": jax.default_backend(),
        "n_candidates": cfg.n_candidates,
        "single": bench_mode(cfg, state, 1, n_iters),
        "burst16": bench_mode(cfg, state, 16, n_iters),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
