#!/bin/bash
# r3k: re-run the sharded-plan TPU probe now covering the trajopt
# program (all FOUR planner families TPU-compile-proven in sharded form).
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r3k
source benchmarks/wait_healthy.sh
for attempt in 1 2 3; do
  wait_healthy
  timeout 5400 python benchmarks/sharded_plan_tpu.py \
    && { echo "[r3k] done" >&2; break; }
  echo "[r3k] attempt $attempt failed" >&2
done
echo "=== r3k queue done ==="
