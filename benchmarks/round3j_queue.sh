#!/bin/bash
# r3j: trajopt bench extended with the matched latent-grad leg and a
# 60-step/lr-0.05 trajopt leg (quadrotor verdict at bigger budget).
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r3j
source benchmarks/wait_healthy.sh
for attempt in 1 2 3; do
  wait_healthy
  timeout 5400 python benchmarks/trajopt_bench.py 256 \
    && { echo "[r3j] done" >&2; break; }
  echo "[r3j] attempt $attempt failed" >&2
done
echo "=== r3j queue done ==="
