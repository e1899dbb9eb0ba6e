#!/bin/bash
# Round-4 leg S: seed robustness for the quadrotor cem+trajopt
# expert-iteration win (BASELINE.md r4: 0.310 -> 0.431 at seed 0 /
# RECORD_SEED).  The repo's own standard (CLAUDE.md) is >=3 seeds
# before calling a recipe a win; `distill --seed N` varies both the
# recording scene draw and the fine-tune PRNG.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r4s
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r4s] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r4/${name}.log" 2>&1 \
      && { echo "[r4s] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r4s] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

for seed in 1 2; do
  leg "distill_quad_ct_s${seed}" 9000 python -m ndivplanning_tpu.cli distill \
    --workdir checkpoints/quadrotor150k \
    --distill-workdir "/tmp/r4/distill_quad_ct_s${seed}" \
    --rounds 2 --scenes-per-round 2048 --per-scene 8 --suite-size 512 \
    --planner cem+trajopt --seed "$seed"
  grep '^{"rounds"' "/tmp/r4/distill_quad_ct_s${seed}.log" | tail -1 \
    > "benchmarks/distill_quad_ct_s${seed}.json" || true
done

echo "=== r4s queue done ===" >&2
