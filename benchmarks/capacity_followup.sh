#!/bin/bash
# Follow-ups to the corrected-horizon capacity re-runs (BASELINE.md
# "Capacity re-run"): G 512x2 at g_lr 5e-4 posted mean 0.799 with a
# 0.937-at-healthy-diversity best seed.  Two studies that decide what
# that means:
#   1. half-LR CONTROL at base width — if base G at g_lr 5e-4 matches,
#      the win was the LR, not the capacity;
#   2. seed confirmation 3/4/5 on the g512_halflr recipe — the known
#      per-seed spread is ±0.1+, so the frontier claim needs 6 seeds.
# Same 150k frozen-suite protocol as every other stabiliser study.
cd "$(dirname "$0")/.."
set -u

if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[capfollow] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

export CONVERGENCE_CHUNK_CAP=${CONVERGENCE_CHUNK_CAP:-1250}

run() {
  out=$1; shift
  for attempt in 1 2; do
    CONVERGENCE_OUT="benchmarks/$out" timeout 14400 python \
      benchmarks/convergence_fixed.py 150000 5000 "$@" \
      && return 0
    echo "[capfollow] $out attempt $attempt failed; retrying" >&2
  done
  echo "[capfollow] $out FAILED twice" >&2
}

echo "=== control: base width at half LR ==="
run convergence_imagecond_halflr.json \
  'imagecond:{"g_lr":0.0005,"lr_schedule":"cosine","steps":150000,"seed":0}' \
  'imagecond:{"g_lr":0.0005,"lr_schedule":"cosine","steps":150000,"seed":1}' \
  'imagecond:{"g_lr":0.0005,"lr_schedule":"cosine","steps":150000,"seed":2}'

echo "=== confirmation: G 512x2 half LR, seeds 3-5 ==="
run convergence_imagecond_g512_halflr_s345.json \
  'imagecond:{"g_hidden":[512,512],"g_lr":0.0005,"lr_schedule":"cosine","steps":150000,"seed":3}' \
  'imagecond:{"g_hidden":[512,512],"g_lr":0.0005,"lr_schedule":"cosine","steps":150000,"seed":4}' \
  'imagecond:{"g_hidden":[512,512],"g_lr":0.0005,"lr_schedule":"cosine","steps":150000,"seed":5}'

echo "=== capacity follow-up queue done ==="
