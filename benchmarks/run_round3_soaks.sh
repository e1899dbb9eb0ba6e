#!/bin/bash
# Round-3 soak queue (VERDICT items 3 + 4), sequential on the one dev chip.
# Each convergence run retries once on the tunnel's transient
# FailedPrecondition (CLAUDE.md).
cd "$(dirname "$0")/.."
set -u

run() {
  out=$1; shift
  for attempt in 1 2; do
    CONVERGENCE_OUT="benchmarks/$out" timeout 14400 python \
      benchmarks/convergence_fixed.py 150000 5000 "$@" \
      && return 0
    echo "[soak] $out attempt $attempt failed; retrying" >&2
  done
  echo "[soak] $out FAILED twice" >&2
}

echo "=== diffaug (shift,cutout), 3 seeds ==="
run convergence_imagecond_diffaug.json \
  'imagecond:{"diffaug":"shift,cutout","seed":0}' \
  'imagecond:{"diffaug":"shift,cutout","seed":1}' \
  'imagecond:{"diffaug":"shift,cutout","seed":2}'

echo "=== spectral norm on D, 3 seeds ==="
run convergence_imagecond_sn.json \
  'imagecond:{"d_spectral_norm":true,"seed":0}' \
  'imagecond:{"d_spectral_norm":true,"seed":1}' \
  'imagecond:{"d_spectral_norm":true,"seed":2}'

echo "=== top-k G update (0.5), 3 seeds ==="
run convergence_imagecond_topk.json \
  'imagecond:{"topk_g_fraction":0.5,"seed":0}' \
  'imagecond:{"topk_g_fraction":0.5,"seed":1}' \
  'imagecond:{"topk_g_fraction":0.5,"seed":2}'

echo "=== planning preset at batch 512 + cosine (serving-quality gap) ==="
for attempt in 1 2; do
  timeout 14400 python -m ndivplanning_tpu.cli train --preset planning \
    --steps 150000 --batch-size 512 --workdir /tmp/ndivplanning_tpu/planning512 \
    --set lr_schedule=cosine --set eval_every=5000 \
    --set eval_suite_scenes=512 --set checkpoint_every=25000 \
    --set log_every=5000 && break
  echo "[soak] planning512 attempt $attempt failed; retrying" >&2
done
echo "=== round-3 soak queue done ==="
