#!/bin/bash
# Round-4 leg P: re-run the planning512 expert-iteration leg on the
# FIXED fine-tune recipe (fine-grained eval cadence + diversity-floored
# best tracking, commit eb0ebbc) — the r4m attempts ran pre-fix code
# whose round candidate was always the collapsed end state.
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

rm -rf /tmp/r4/distill_p512_v2
leg distill_p512_v2 9000 python -m ndivplanning_tpu.cli distill \
  --workdir checkpoints/planning512 \
  --distill-workdir /tmp/r4/distill_p512_v2 \
  --rounds 2 --scenes-per-round 2048 --per-scene 4 --suite-size 512 \
  --mpc-candidates 256 --mpc-replan 8
grep '^{"rounds"' /tmp/r4/distill_p512_v2.log | tail -1 \
  > benchmarks/distill_p512_v2.json || true

echo "=== r4p queue done ===" >&2
