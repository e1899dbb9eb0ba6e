#!/bin/bash
# r3i: trajopt vs one-shot vs CEM at suite scale on the vendored trained
# checkpoints (quadrotor150k, planning512) — benchmarks/trajopt_bench.py.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r3i
source benchmarks/wait_healthy.sh
for attempt in 1 2 3; do
  wait_healthy
  timeout 5400 python benchmarks/trajopt_bench.py 256 \
    && { echo "[r3i] trajopt bench done" >&2; break; }
  echo "[r3i] attempt $attempt failed" >&2
done
echo "=== r3i queue done ==="
