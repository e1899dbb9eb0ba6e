#!/bin/bash
# Round-4 leg P (v2): planning512 expert-iteration re-runs on the fixed
# fine-tune recipe (eval cadence + diversity-floored best tracking +
# donation-alias fix + round-granular resume).  Two teachers:
#   - mpc: the closed-loop 1.000 teacher, open-loop keep ~0.27;
#   - trajopt: the measured best OPEN-LOOP mode on kinematic families
#     (reach 1.000, BASELINE.md r3j) — its optima replay open-loop by
#     construction, so the expert set is ~4x larger per recorded scene.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r4p
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r4p] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r4/${name}.log" 2>&1 \
      && { echo "[r4p] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r4p] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

leg distill_p512_mpc 9000 python -m ndivplanning_tpu.cli distill \
  --workdir checkpoints/planning512 \
  --distill-workdir /tmp/r4/distill_p512_mpc \
  --rounds 2 --scenes-per-round 2048 --per-scene 4 --suite-size 512 \
  --mpc-candidates 256 --mpc-replan 8
grep '^{"rounds"' /tmp/r4/distill_p512_mpc.log | tail -1 \
  > benchmarks/distill_p512_mpc.json || true

leg distill_p512_trajopt 9000 python -m ndivplanning_tpu.cli distill \
  --workdir checkpoints/planning512 \
  --distill-workdir /tmp/r4/distill_p512_trajopt \
  --rounds 2 --scenes-per-round 2048 --per-scene 4 --suite-size 512 \
  --planner trajopt
grep '^{"rounds"' /tmp/r4/distill_p512_trajopt.log | tail -1 \
  > benchmarks/distill_p512_trajopt.json || true

echo "=== r4p queue done ===" >&2
