#!/bin/bash
# r5d: retry the reacher score-axis distillation leg (VERDICT r4 #3's
# second kinematic family) with a deeper attempt budget.  The r5b leg
# lost all three attempts to the same failure shape: the worker flapped
# mid-way through the ~26-minute round-1 recording phase and the client
# hung forever mid-dispatch (zero tunnel reads, frozen CPU — killed by
# exact PID both times).  Recording length ~ flap cadence (20-40 min)
# makes each attempt a coin flip, so this queue gives the leg 6 attempts
# and relies on round-granular crash-resume (round_0 is complete on disk
# and is validated + reused by its record.json echo).  Chained behind
# the r5c queue via WAIT_PID.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r5d
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r5

for attempt in 1 2 3 4 5 6; do
  wait_healthy
  echo "[r5d] distill_reacher_trajopt attempt $attempt $(date -u +%H:%M:%S)" >&2
  timeout 3600 python -m ndivplanning_tpu.cli distill \
    --workdir checkpoints/reacher150k \
    --distill-workdir /tmp/r5/distill_reacher_trajopt \
    --rounds 2 --scenes-per-round 2048 --per-scene 8 --suite-size 512 \
    --planner trajopt --mpc-candidates 48 --track eval_plan_best_score \
    >> /tmp/r5/distill_reacher_trajopt.log 2>&1 \
    && { echo "[r5d] done $(date -u +%H:%M:%S)" >&2; break; }
  echo "[r5d] attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
done
grep '^{"rounds"' /tmp/r5/distill_reacher_trajopt.log | tail -1 \
  > benchmarks/distill_reacher_trajopt.json || true
echo "=== r5d queue done ===" >&2
