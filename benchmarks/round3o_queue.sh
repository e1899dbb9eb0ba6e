#!/bin/bash
# r3o: the reacher five-leg planner study at REDUCED dispatch size — the
# 256-scene version crashed the TPU worker twice (the >1-min-dispatch
# class, CLAUDE.md): reacher's FK + link-collision step is ~4x the other
# families' compute, and 256 scenes x 250 warm starts x 60 fwd+bwd Adam
# steps blew the per-dispatch budget.  64 scenes keeps every leg well
# under the wall while still suite-representative.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r3o
source benchmarks/wait_healthy.sh
for attempt in 1 2 3; do
  wait_healthy
  TRAJOPT_OUT=benchmarks/trajopt_results_reacher.json \
    timeout 5400 python benchmarks/trajopt_bench.py 64 \
    /tmp/ndivplanning_tpu/reacher150k \
    && { echo "[r3o] reacher study done" >&2; break; }
  echo "[r3o] attempt $attempt failed" >&2
done
echo "=== r3o queue done ==="
