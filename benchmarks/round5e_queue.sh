#!/bin/bash
# r5e: close VERDICT r4 weak #6 — ADA measured at the HALF-LR recipe.
# The r4 ADA negative ("r_t arrives too late to gate anything") was
# measured at cosine g_lr 5e-4, but the control where the r_ema signal
# demonstrably sat in ADA's informative band (0.55-0.65) was the
# half-LR production recipe (cosine + g_lr 2.5e-4).  Three 150k seeds
# at exactly that recipe + diffaug/ada_target from the r4 study close
# the class at the recipe where the signal exists.  Cheap: imagecond
# b512 150k soaks measure 90-260 s wall each (CLAUDE.md round 3).
# Chained behind the r5c arm3 program via WAIT_PID.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r5e
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r5

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r5e] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r5/${name}.log" 2>&1 \
      && { echo "[r5e] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r5e] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

CONVERGENCE_OUT=benchmarks/convergence_ada_halflr.json \
  leg ada_halflr 6000 python benchmarks/convergence_fixed.py 150000 5000 \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.00025,"diffaug":"shift,cutout","ada_target":0.6,"seed":0}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.00025,"diffaug":"shift,cutout","ada_target":0.6,"seed":1}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.00025,"diffaug":"shift,cutout","ada_target":0.6,"seed":2}'

echo "=== r5e queue done ===" >&2
