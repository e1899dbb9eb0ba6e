#!/bin/bash
# Round-4 leg T: two follow-ups from the round's own measurements.
#
# t1. Eleventh stabiliser avenue — LATE-START D warm-restarts
#     (d_reset_start=60000, d_reset_every=20000): always-on restarts are
#     the only avenue that holds late diversity but they cap the peak
#     (0.517 vs half-LR's 0.747 best-of-both band); half-LR posts its
#     peak anywhere in 30k-135k then collapses.  Starting the restarts
#     at 60k leaves the early trajectory untouched and applies the
#     only-measured-to-work late-health mechanism from there.
# t2. iLQR-36 teacher for quadrotor expert iteration: iLQR-36 is now the
#     measured BEST open-loop mode (0.5372 < cem+trajopt 0.5465); its
#     optima are smooth dynamically-consistent paths.  Same protocol as
#     the ct study (2048 x per_scene 8, rounds 0-1, frozen 512-suite)
#     so the teacher comparison is apples-to-apples.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r4t
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r4t] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r4/${name}.log" 2>&1 \
      && { echo "[r4t] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r4t] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

CONVERGENCE_OUT=benchmarks/convergence_dreset_late.json \
  leg dreset_late 12000 python benchmarks/convergence_fixed.py 150000 5000 \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"d_reset_every":20000,"d_reset_start":60000,"seed":0}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"d_reset_every":20000,"d_reset_start":60000,"seed":1}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"d_reset_every":20000,"d_reset_start":60000,"seed":2}'

leg distill_quad_ilqr 9000 python -m ndivplanning_tpu.cli distill \
  --workdir checkpoints/quadrotor150k \
  --distill-workdir /tmp/r4/distill_quad_ilqr \
  --rounds 2 --scenes-per-round 2048 --per-scene 8 --suite-size 512 \
  --planner ilqr
grep '^{"rounds"' /tmp/r4/distill_quad_ilqr.log | tail -1 \
  > benchmarks/distill_quadrotor_ilqr.json || true

echo "=== r4t queue done ===" >&2
