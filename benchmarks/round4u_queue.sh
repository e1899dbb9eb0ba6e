#!/bin/bash
# Round-4 leg U: TPU compile-proof for the two NEW sharded planner
# families (iLQR, cem+trajopt) — re-run benchmarks/sharded_plan_tpu.py,
# which now covers all SIX planner programs (plan/cem/grad/trajopt/
# ilqr/hybrid) with honest device_get-synced timing on the real chip.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r4u
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r4u] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r4/${name}.log" 2>&1 \
      && { echo "[r4u] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r4u] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

leg sharded_plan_tpu_v2 7200 python benchmarks/sharded_plan_tpu.py

echo "=== r4u queue done ===" >&2
