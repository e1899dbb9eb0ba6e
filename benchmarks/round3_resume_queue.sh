#!/bin/bash
# Round-3 resume chain (2026-08-18): the host rebooted mid-outage and
# killed every chained queue; the chip is healthy again, so run the
# still-pending studies serially, short benches first so a second
# outage costs the least science:
#   1. serving TCP/cross-batch matrix   -> serving_results_tcp_r3.json
#   2. quadrotor family quality soak    -> convergence_quadrotor_cosine.json
#   3. per-family rollout cost on TPU   -> env_family_results.json
#   4. master soak queue (LeCam x2, half-LR control, g512_halflr
#      seeds 3-5, two capacity re-runs) -> see master_queue.sh
cd "$(dirname "$0")/.."
set -u
bash benchmarks/serving_tcp_queue.sh
bash benchmarks/quadrotor_queue.sh
bash benchmarks/env_family_queue.sh
bash benchmarks/master_queue.sh
echo "=== round3 resume chain done ==="
