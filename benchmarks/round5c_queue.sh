#!/bin/bash
# r5c: give the NEW arm3 family (first 3-D action space, r5) the same
# quality evidence every other family ships — a 150k-cosine goalcond
# checkpoint trained through the CLI, open-loop + closed-loop (MPC)
# suite evals, and the planner-family study at the reacher-sized
# 64-scene dispatch budget (three-link FK makes rollouts strictly
# pricier than reacher's; 256 scenes blew the ~1-minute worker wall
# there — CLAUDE.md round-3 gotcha).  Chained behind the r5b queue via
# WAIT_PID.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r5c
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r5

WD=/tmp/r5/arm3150k
echo "=== arm3: train 150k cosine ===" >&2
for attempt in 1 2 3; do
  wait_healthy
  timeout 7200 python -m ndivplanning_tpu.cli train --preset goalcond \
    --steps 150000 --workdir "$WD" \
    --set env=arm3 --set lr_schedule=cosine \
    --set log_every=1000 --set eval_every=5000 \
    >> /tmp/r5/arm3_train.log 2>&1 \
    && { echo "[r5c] arm3 trained" >&2; break; }
  echo "[r5c] arm3 train attempt $attempt failed" >&2
done
wait_healthy
timeout 3600 python -m ndivplanning_tpu.cli eval --workdir "$WD" \
  2>>/tmp/r5/arm3_eval.log > benchmarks/arm3150k_eval.json \
  || echo "[r5c] arm3 eval failed" >&2
wait_healthy
timeout 3600 python -m ndivplanning_tpu.cli eval --workdir "$WD" --mpc \
  2>>/tmp/r5/arm3_eval.log > benchmarks/arm3150k_mpc.json \
  || echo "[r5c] arm3 mpc eval failed" >&2

echo "=== planner study on the arm3 checkpoint ===" >&2
for attempt in 1 2 3; do
  wait_healthy
  TRAJOPT_OUT=benchmarks/trajopt_results_arm3.json \
    timeout 5400 python benchmarks/trajopt_bench.py 64 "$WD" \
    >> /tmp/r5/arm3_ladder.log 2>&1 \
    && { echo "[r5c] arm3 planner study done" >&2; break; }
  echo "[r5c] arm3 planner study attempt $attempt failed" >&2
done
for f in benchmarks/arm3150k_eval.json benchmarks/arm3150k_mpc.json; do
  [ -f "$f" ] && echo "$f: $(cat $f)"
done
echo "=== r5c queue done ===" >&2
