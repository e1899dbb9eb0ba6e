#!/bin/bash
# Round-4 leg N: stabiliser follow-ups after the ADA G-pass gating fix.
#
# n1. ADA v2 (bug-fixed program), 3 seeds at the canonical target 0.6
#     AND 3 seeds at target 0.4 — the control measurement showed r_ema
#     hovers ~0.55-0.65 in this regime, so 0.6 keeps p near 0 (a do-
#     nothing controller); 0.4 makes it actually engage.
# n2. D warm-restarts (d_reset_every=20000; collapse onset is ~15-20k
#     in every measured seed), 3 seeds — the other untried avenue in
#     the class.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r4n
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r4n] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r4/${name}.log" 2>&1 \
      && { echo "[r4n] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r4n] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

CONVERGENCE_OUT=benchmarks/convergence_ada_v2.json \
  leg ada_v2 16000 python benchmarks/convergence_fixed.py 150000 5000 \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.6,"seed":0}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.6,"seed":1}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.6,"seed":2}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.4,"seed":0}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.4,"seed":1}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.4,"seed":2}'

CONVERGENCE_OUT=benchmarks/convergence_dreset.json \
  leg dreset 12000 python benchmarks/convergence_fixed.py 150000 5000 \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"d_reset_every":20000,"seed":0}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"d_reset_every":20000,"seed":1}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"d_reset_every":20000,"seed":2}'

echo "=== r4n queue done ===" >&2
