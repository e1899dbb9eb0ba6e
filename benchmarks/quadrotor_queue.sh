#!/bin/bash
# Quadrotor-family quality soak, chained behind the serving-tcp queue
# (WAIT_PID): 3 seeds x 150k cosine on goalcond with env=quadrotor —
# the same protocol as the unicycle/reacher family rows (frozen
# 512-scene suite, best-of-both per point) so all four env families'
# quality evidence is directly comparable in BASELINE.md.  The
# underactuated family is the hard one: candidates must thrust-vector
# under gravity, so expect a lower ceiling than the kinematic families.
cd "$(dirname "$0")/.."
set -u
export CONVERGENCE_CHUNK_CAP=${CONVERGENCE_CHUNK_CAP:-1250}

if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[quadrotor] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

HEALTH_TAG=quadrotor
source benchmarks/wait_healthy.sh

echo "=== quadrotor goalcond cosine, 3 seeds x 150k ==="
for attempt in 1 2 3; do
  wait_healthy
  CONVERGENCE_OUT=benchmarks/convergence_quadrotor_cosine.json \
    timeout 7200 python benchmarks/convergence_fixed.py 150000 5000 \
    'goalcond:{"env":"quadrotor","lr_schedule":"cosine","steps":150000,"seed":0}' \
    'goalcond:{"env":"quadrotor","lr_schedule":"cosine","steps":150000,"seed":1}' \
    'goalcond:{"env":"quadrotor","lr_schedule":"cosine","steps":150000,"seed":2}' \
    && { echo "[quadrotor] soak done" >&2; break; }
  echo "[quadrotor] attempt $attempt failed; health-gating retry" >&2
done

echo "=== quadrotor queue done ==="
