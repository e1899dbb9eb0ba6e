#!/bin/bash
# Reacher-family quality soak, chained behind the follow-up queue
# (WAIT_PID): 3 seeds x 150k cosine on goalcond with env=reacher —
# the same protocol as the unicycle family row (frozen 512-scene
# suite, best-of-both per point) so the three env families' quality
# evidence is directly comparable in BASELINE.md.
cd "$(dirname "$0")/.."
set -u
export CONVERGENCE_CHUNK_CAP=${CONVERGENCE_CHUNK_CAP:-1250}

if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[reacher] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

HEALTH_TAG=reacher
source benchmarks/wait_healthy.sh

echo "=== reacher goalcond cosine, 3 seeds x 150k ==="
for attempt in 1 2 3; do
  wait_healthy
  CONVERGENCE_OUT=benchmarks/convergence_reacher_cosine.json \
    timeout 7200 python benchmarks/convergence_fixed.py 150000 5000 \
    'goalcond:{"env":"reacher","lr_schedule":"cosine","steps":150000,"seed":0}' \
    'goalcond:{"env":"reacher","lr_schedule":"cosine","steps":150000,"seed":1}' \
    'goalcond:{"env":"reacher","lr_schedule":"cosine","steps":150000,"seed":2}' \
    && { echo "[reacher] soak done" >&2; break; }
  echo "[reacher] attempt $attempt failed; health-gating retry" >&2
done

echo "=== reacher queue done ==="
