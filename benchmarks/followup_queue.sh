#!/bin/bash
# Post-soak follow-ups, chained behind the master soak queue (WAIT_PID):
#   1. NDiv backward row-tile sweep (1280/1536/1792 were never measured;
#      each candidate isolated in a subprocess — a Mosaic VMEM compile
#      failure is a recorded data point, not an abort).
#   2. Suite-scale CLOSED-LOOP quality of the shipped planning512
#      checkpoint (eval --mpc: every frozen-suite scene as a receding-
#      horizon episode, digit-reproducible) -> mpc_suite_results.json
#      (written via temp+mv so a failed attempt cannot clobber a good
#      artifact with an empty file).
cd "$(dirname "$0")/.."
set -u

if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[followup] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

HEALTH_TAG=followup
source benchmarks/wait_healthy.sh

echo "=== NDiv backward tile sweep ==="
wait_healthy
timeout 7200 python benchmarks/ndiv_tile_sweep.py \
  || echo "[followup] tile sweep failed" >&2

echo "=== closed-loop suite quality: planning512 ==="
wait_healthy
if timeout 3600 python -m ndivplanning_tpu.cli eval \
     --workdir checkpoints/planning512 --mpc \
     > benchmarks/.mpc_suite_results.tmp; then
  mv benchmarks/.mpc_suite_results.tmp benchmarks/mpc_suite_results.json
  cat benchmarks/mpc_suite_results.json
else
  rm -f benchmarks/.mpc_suite_results.tmp
  echo "[followup] eval --mpc failed" >&2
fi

echo "=== follow-up queue done ==="
