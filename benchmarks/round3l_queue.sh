#!/bin/bash
# r3l: action-space training soak on the hard family — 3 seeds x 150k
# cosine, goalcond env=quadrotor rollout_mode=actions (expert actions
# distilled through the cascaded controller).  Question: does emitting
# ACTIONS (dynamically consistent by construction) lift the per-draw
# quadrotor ceiling that waypoint mode pins at ~0.30?
cd "$(dirname "$0")/.."
set -u
export CONVERGENCE_CHUNK_CAP=${CONVERGENCE_CHUNK_CAP:-1250}
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r3l
source benchmarks/wait_healthy.sh
for attempt in 1 2 3; do
  wait_healthy
  CONVERGENCE_OUT=benchmarks/convergence_quadrotor_actions.json \
    timeout 7200 python benchmarks/convergence_fixed.py 150000 5000 \
    'goalcond:{"env":"quadrotor","rollout_mode":"actions","generator_output":"linear","lr_schedule":"cosine","steps":150000,"seed":0}' \
    'goalcond:{"env":"quadrotor","rollout_mode":"actions","generator_output":"linear","lr_schedule":"cosine","steps":150000,"seed":1}' \
    'goalcond:{"env":"quadrotor","rollout_mode":"actions","generator_output":"linear","lr_schedule":"cosine","steps":150000,"seed":2}' \
    && { echo "[r3l] quadrotor actions soak done" >&2; break; }
  echo "[r3l] attempt $attempt failed" >&2
done
echo "=== r3l summary ===" >&2
python benchmarks/summarize_convergence.py \
  benchmarks/convergence_quadrotor_actions.json 2>&1 || true
echo "=== r3l queue done ==="
