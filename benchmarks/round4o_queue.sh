#!/bin/bash
# Round-4 leg O: follow-ups on the r4m study results.
#
# o1. iLQR budget sweep: the default (62 warm x 12 iters) lost to
#     one-shot (0.5567 vs 0.5524); before closing the negative, try
#     3x iterations and 2x warm starts (separately — each is one
#     compiled program).
# o2. Quadrotor distillation with the cem+trajopt TEACHER (the new
#     best open-loop mode, and its optima are open-loop-consistent by
#     construction where MPC's executed paths kept only 0.21-0.23) at
#     per_scene 8 + the diversity guard.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r4o
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r4o] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r4/${name}.log" 2>&1 \
      && { echo "[r4o] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r4o] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

ILQR_ITERS=36 ILQR_OUT=benchmarks/ilqr_results_i36.json \
  leg ilqr_i36 7200 python benchmarks/ilqr_bench.py 64 quadrotor150k

ILQR_WARM=125 ILQR_OUT=benchmarks/ilqr_results_w125.json \
  leg ilqr_w125 7200 python benchmarks/ilqr_bench.py 64 quadrotor150k

leg distill_quad_ct 9000 python -m ndivplanning_tpu.cli distill \
  --workdir checkpoints/quadrotor150k \
  --distill-workdir /tmp/r4/distill_quad_ct \
  --rounds 2 --scenes-per-round 2048 --per-scene 8 --suite-size 512 \
  --planner cem+trajopt
grep '^{"rounds"' /tmp/r4/distill_quad_ct.log | tail -1 \
  > benchmarks/distill_quad_ct.json || true

echo "=== r4o queue done ===" >&2
