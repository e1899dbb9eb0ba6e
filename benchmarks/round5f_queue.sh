#!/bin/bash
# r5f: second machine-recycle resume.  The 2026-08-20 ~21:51 UTC recycle
# wiped /tmp (all queue state/logs) and changed the image so that
# /opt/venv/bin is no longer on PATH (launch this queue with
# PATH=/opt/venv/bin:$PATH).  queue_status.py reconciled the ledger
# against committed artifacts; the five legs below are exactly the
# MISSING rows, in judge-priority order:
#   1. tf_0.00005_2       — last transformer-matrix seed (VERDICT r4 #4)
#   2. ada_halflr         — ADA at the half-LR recipe, 3 seeds (weak #6)
#   3. selfdistill        — twelfth stabiliser avenue (VERDICT r4 #5)
#   4. arm3 program       — r5c: 150k ckpt + evals + planner study
#   5. reacher distill    — r5d: 6-attempt retry (flap-window coin flip)
# Legs 4/5 delegate to their existing queue scripts (WAIT_PID unset ->
# they start immediately when reached).
cd "$(dirname "$0")/.."
set -u
HEALTH_TAG=r5f
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r5

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r5f] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r5/${name}.log" 2>&1 \
      && { echo "[r5f] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r5f] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

if [[ ! -s benchmarks/convergence_tf_lr0.00005_s2.json ]]; then
  CONVERGENCE_CHUNK_CAP=2000 \
  CONVERGENCE_OUT=benchmarks/convergence_tf_lr0.00005_s2.json \
    leg tf_0.00005_2 6000 python benchmarks/convergence_fixed.py \
    100000 10000 \
    'goalcond:{"g_arch":"transformer","lr_schedule":"cosine","compute_dtype":"bf16","warmup_steps":2000,"g_lr":0.00005,"seed":2}'
fi

if [[ ! -s benchmarks/convergence_ada_halflr.json ]]; then
  CONVERGENCE_OUT=benchmarks/convergence_ada_halflr.json \
    leg ada_halflr 6000 python benchmarks/convergence_fixed.py 150000 5000 \
    'imagecond:{"lr_schedule":"cosine","g_lr":0.00025,"diffaug":"shift,cutout","ada_target":0.6,"seed":0}' \
    'imagecond:{"lr_schedule":"cosine","g_lr":0.00025,"diffaug":"shift,cutout","ada_target":0.6,"seed":1}' \
    'imagecond:{"lr_schedule":"cosine","g_lr":0.00025,"diffaug":"shift,cutout","ada_target":0.6,"seed":2}'
fi

if [[ ! -s benchmarks/selfdistill_imagecond.json ]]; then
  leg selfdistill 10000 python benchmarks/selfdistill_bench.py 100000 0 1 2
fi

bash benchmarks/round5c_queue.sh
bash benchmarks/round5d_queue.sh

echo "=== r5f queue done ===" >&2
