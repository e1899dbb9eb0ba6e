#!/bin/bash
# Round-4 leg B: the planning512 expert-iteration leg (re-run — the
# first attempt died with the session that launched it; VERDICT #1's
# imagecond/planning512 question is still open).  Health-gated.
set -u
cd /root/repo
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4
export HEALTH_TAG=r4b

run_leg() {
  local name="$1"; shift
  wait_healthy
  echo "[r4b] $name start $(date -u +%H:%M:%S)" >&2
  timeout 9000 python -m ndivplanning_tpu.cli "$@" \
    > "benchmarks/${name}.json" 2>"/tmp/r4/${name}.log"
  echo "[r4b] $name rc=$? $(date -u +%H:%M:%S)" >&2
}

run_leg distill_planning512 distill \
  --workdir checkpoints/planning512 \
  --distill-workdir /tmp/r4/distill_planning512 \
  --rounds 2 --scenes-per-round 4096 --suite-size 512 \
  --mpc-candidates 256 --mpc-replan 8

echo "[r4b] queue done" >&2
