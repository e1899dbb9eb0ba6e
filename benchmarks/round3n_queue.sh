#!/bin/bash
# r3n: complete the family coverage — train 150k-cosine unicycle and
# reacher checkpoints through the CLI (per-family workdirs, best
# tracking), then measure on each: open-loop eval, suite-scale
# closed-loop MPC (eval --mpc), and the four-planner study
# (trajopt_bench).  Gives every env family the same quality evidence
# the pointmass/quadrotor checkpoints already have.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r3n
source benchmarks/wait_healthy.sh

for env in unicycle reacher; do
  WD=/tmp/ndivplanning_tpu/${env}150k
  echo "=== $env: train 150k cosine ===" >&2
  for attempt in 1 2 3; do
    wait_healthy
    timeout 7200 python -m ndivplanning_tpu.cli train --preset goalcond \
      --steps 150000 --workdir "$WD" \
      --set env=$env --set lr_schedule=cosine \
      --set log_every=1000 --set eval_every=5000 \
      && { echo "[r3n] $env trained" >&2; break; }
    echo "[r3n] $env train attempt $attempt failed" >&2
  done
  wait_healthy
  timeout 3600 python -m ndivplanning_tpu.cli eval --workdir "$WD" \
    > benchmarks/${env}150k_eval.json \
    || echo "[r3n] $env eval failed" >&2
  wait_healthy
  timeout 3600 python -m ndivplanning_tpu.cli eval --workdir "$WD" --mpc \
    > benchmarks/${env}150k_mpc.json \
    || echo "[r3n] $env mpc eval failed" >&2
done

echo "=== four-planner study on the new checkpoints ===" >&2
for attempt in 1 2 3; do
  wait_healthy
  TRAJOPT_OUT=benchmarks/trajopt_results_families.json \
    timeout 5400 python benchmarks/trajopt_bench.py 256 \
    /tmp/ndivplanning_tpu/unicycle150k /tmp/ndivplanning_tpu/reacher150k \
    && { echo "[r3n] planner study done" >&2; break; }
  echo "[r3n] planner study attempt $attempt failed" >&2
done
for f in benchmarks/unicycle150k_eval.json benchmarks/unicycle150k_mpc.json \
         benchmarks/reacher150k_eval.json benchmarks/reacher150k_mpc.json; do
  [ -f "$f" ] && echo "$f: $(cat $f)"
done
echo "=== r3n queue done ==="
