"""Network serving walkthrough: TCP server + PlanningClient.

    python examples/serve_client.py

Trains a small goal-conditioned model for a few hundred steps, starts
the JSON-lines planning server over TCP with cross-client dynamic
batching (`planning.server.serve_tcp`), then talks to it from several
concurrent `PlanningClient` connections — single plans, a batched
array request, a closed-loop MPC episode, and an error reply — the way
a production deployment's clients would.  See docs/deployment.md.
"""

from __future__ import annotations

import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from ndivplanning_tpu.planning.client import PlanningClient, ServerError
    from ndivplanning_tpu.planning.server import serve_tcp, warmup
    from ndivplanning_tpu.train.loop import train
    from ndivplanning_tpu.utils.config import get_config

    cfg = get_config("goalcond", steps=300, batch_size=64, k=8,
                     n_candidates=256, log_every=100)
    print("[1/4] training a small model (300 steps)...")
    state, _ = train(cfg, workdir="")

    print("[2/4] starting the TCP server (cross-client batching on)...")
    warmup(cfg, state, buckets=(1, 2, 4))  # pre-compile small buckets
    server = serve_tcp(cfg, state, port=0, cross_batch=True)
    host, port = server.server_address[:2]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    print(f"      listening on {host}:{port}")

    print("[3/4] three concurrent clients...")
    results = {}

    def one_client(i: int) -> None:
        with PlanningClient.tcp(host, port) as c:
            results[i] = c.plan(start=[0.1 + 0.2 * i, 0.1],
                                goal=[0.9, 0.9],
                                obstacles=[[0.5, 0.5, 0.12]])

    threads = [threading.Thread(target=one_client, args=(i,))
               for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, r in sorted(results.items()):
        print(f"      client {i}: score={r['best_score']:.3f} "
              f"reached={r['best_reached']:.0f} "
              f"latency={r['latency_ms']:.0f} ms "
              f"(dispatch batch {r['batch_size']})")

    print("[4/4] batch + error handling on one connection...")
    with PlanningClient.tcp(host, port) as c:
        batch = c.plan_batch([
            {"start": [0.1, 0.1], "goal": [0.9, 0.9]},
            {"start": [0.2, 0.3], "goal": [0.8, 0.7]},
        ])
        print(f"      array line -> {len(batch)} plans in one dispatch")
        try:
            c.plan(start=[0.1], goal=[0.9, 0.9])
        except ServerError as e:
            print(f"      malformed request isolated: {e}")

    server.shutdown()
    server.server_close()
    print(f"done — served {server.lines_served} lines")


if __name__ == "__main__":
    main()
