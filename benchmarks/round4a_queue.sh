#!/bin/bash
# Round-4 leg A: expert-iteration distillation studies (VERDICT #1).
#
# Teacher: closed-loop MPC (measured 1.000 at suite scale on every
# family, BASELINE.md r3n).  Question: does distilling its successes
# back into G lift one-shot frozen-suite quality — on the quadrotor
# (the family whose generator never got good: per-draw 0.25-0.27) and
# on planning512 (the 0.833 serving frontier)?
#
# Health-gated per leg (worker outages last minutes-to-hours; CLAUDE.md
# round 3).  Each leg's JSON report lands in benchmarks/, logs in
# /tmp/r4.
set -u
cd /root/repo
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4
export HEALTH_TAG=r4a

run_leg() {
  local name="$1"; shift
  wait_healthy
  echo "[r4a] $name start $(date -u +%H:%M:%S)" >&2
  timeout 9000 python -m ndivplanning_tpu.cli "$@" \
    > "benchmarks/${name}.json" 2>"/tmp/r4/${name}.log"
  echo "[r4a] $name rc=$? $(date -u +%H:%M:%S)" >&2
}

run_leg distill_quadrotor distill \
  --workdir checkpoints/quadrotor150k \
  --distill-workdir /tmp/r4/distill_quadrotor \
  --rounds 2 --scenes-per-round 4096 --suite-size 512 \
  --mpc-candidates 256 --mpc-replan 8

run_leg distill_planning512 distill \
  --workdir checkpoints/planning512 \
  --distill-workdir /tmp/r4/distill_planning512 \
  --rounds 2 --scenes-per-round 4096 --suite-size 512 \
  --mpc-candidates 256 --mpc-replan 8

echo "[r4a] queue done" >&2
