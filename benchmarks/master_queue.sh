#!/bin/bash
# Health-gated soak queue: the axon TPU worker can crash and take 10+
# minutes (sometimes an hour) to come back, and a client that starts
# while it is down fails at backend init — naive scripted retries burn
# both attempts against a dead worker (measured 2026-08-17: g512_d512
# lost attempt 1 to a mid-soak worker crash that HUNG the dispatch for
# 28 min, then attempt 2 to UNAVAILABLE at init during recovery).  This
# queue probes chip health with a tiny timeout-bounded program before
# every attempt and waits until the probe passes.
#
# Remaining round-3 studies, novel science first (if the chip returns
# late in the session, the LeCam and half-LR-control results are the
# ones no prior analysis covers):
#   1-2. the two capacity re-runs the crashed queue did not finish
#   3-4. LeCam stabiliser at two weights on the cosine recipe
#   5.   half-LR control at base width (is the g512_halflr win the LR?)
#   6.   g512_halflr seed confirmation 3/4/5 (frontier claim needs 6
#        seeds given the +-0.1 per-seed spread)
cd "$(dirname "$0")/.."
set -u
export CONVERGENCE_CHUNK_CAP=${CONVERGENCE_CHUNK_CAP:-1250}

HEALTH_TAG=queue
source benchmarks/wait_healthy.sh

run() {  # run OUTFILE PRESET_SPECS...
  out=$1; shift
  for attempt in 1 2 3; do
    wait_healthy
    CONVERGENCE_OUT="benchmarks/$out" timeout 7200 python \
      benchmarks/convergence_fixed.py 150000 5000 "$@" \
      && { echo "[queue] $out done" >&2; return 0; }
    echo "[queue] $out attempt $attempt failed; health-gating retry" >&2
  done
  echo "[queue] $out FAILED three times" >&2
}

seeds() {  # seeds OUTFILE OVERRIDES_JSON_WITHOUT_CLOSING_BRACE S0 S1 S2
  out=$1; ov=$2; a=$3; b=$4; c=$5
  run "$out" \
    "imagecond:${ov},\"seed\":$a}" \
    "imagecond:${ov},\"seed\":$b}" \
    "imagecond:${ov},\"seed\":$c}"
}

echo "=== LeCam 0.1 on cosine ==="
seeds convergence_imagecond_lecam01_cosine.json \
  '{"lecam_weight":0.1,"lr_schedule":"cosine","steps":150000' 0 1 2

echo "=== control: base width at half LR ==="
seeds convergence_imagecond_halflr.json \
  '{"g_lr":0.0005,"lr_schedule":"cosine","steps":150000' 0 1 2

echo "=== LeCam 0.3 on cosine ==="
seeds convergence_imagecond_lecam03_cosine.json \
  '{"lecam_weight":0.3,"lr_schedule":"cosine","steps":150000' 0 1 2

echo "=== confirmation: G 512x2 half LR, seeds 3-5 ==="
seeds convergence_imagecond_g512_halflr_s345.json \
  '{"g_hidden":[512,512],"g_lr":0.0005,"lr_schedule":"cosine","steps":150000' 3 4 5

echo "=== capacity: G 512x2 + D 512x2 (re-run) ==="
seeds convergence_imagecond_g512_d512.json \
  '{"g_hidden":[512,512],"d_hidden":[512,512],"lr_schedule":"cosine","steps":150000' 0 1 2

echo "=== capacity: G 512x2 + wider encoder (re-run) ==="
seeds convergence_imagecond_g512_enc.json \
  '{"g_hidden":[512,512],"encoder_features":[32,64,128],"lr_schedule":"cosine","steps":150000' 0 1 2

echo "=== master queue done ==="

# Analysis-ready table straight into the queue log (and the JSON lines
# after it), so the landing session can read results without re-deriving.
python benchmarks/summarize_convergence.py \
  benchmarks/convergence_imagecond_lecam01_cosine.json \
  benchmarks/convergence_imagecond_lecam03_cosine.json \
  benchmarks/convergence_imagecond_halflr.json \
  benchmarks/convergence_imagecond_g512_halflr_s345.json \
  benchmarks/convergence_imagecond_g512_d512.json \
  benchmarks/convergence_imagecond_g512_enc.json 2>&1 || true
