#!/bin/bash
# r3p: serving bench over the shipped planning512 checkpoint with the
# trajopt rows added (quality-at-latency for the measured-best open-loop
# mode).
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r3p
source benchmarks/wait_healthy.sh
for attempt in 1 2 3; do
  wait_healthy
  SERVING_BENCH_WORKDIR=checkpoints/planning512 \
    timeout 5400 python benchmarks/serving_bench.py 20 20 45 \
    > benchmarks/serving_results_trajopt.json \
    && { echo "[r3p] serving bench done" >&2; break; }
  echo "[r3p] attempt $attempt failed" >&2
done
tail -c 600 benchmarks/serving_results_trajopt.json
echo "=== r3p queue done ==="
