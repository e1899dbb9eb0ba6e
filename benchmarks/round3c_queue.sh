#!/bin/bash
# Round-3 queue C (chained behind r3b via WAIT_PID): apply the 6-seed-
# confirmed half-LR recipe to the SERVING config — 3 seeds of the
# planning preset at batch 512, cosine + g_lr 5e-4, trained through the
# CLI so each run keeps a workdir (config.json + best checkpoint).  If
# any seed's frozen-suite best beats the shipped 0.833, it becomes the
# new vendored serving checkpoint (checkpoints/planning512).
cd "$(dirname "$0")/.."
set -u

if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[r3c] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

HEALTH_TAG=r3c
source benchmarks/wait_healthy.sh

for seed in 0 1 2; do
  WD=/tmp/ndivplanning_tpu/planning512_halflr_s$seed
  echo "=== planning512 half-LR seed $seed ===" >&2
  for attempt in 1 2 3; do
    wait_healthy
    timeout 7200 python -m ndivplanning_tpu.cli train --preset planning \
      --steps 150000 --batch-size 512 --workdir "$WD" \
      --set lr_schedule=cosine --set g_lr=0.0005 --set seed=$seed \
      --set log_every=1000 --set eval_every=5000 \
      && { echo "[r3c] seed $seed trained" >&2; break; }
    echo "[r3c] seed $seed attempt $attempt failed" >&2
  done
  wait_healthy
  timeout 3600 python -m ndivplanning_tpu.cli eval --workdir "$WD" \
    > benchmarks/.p512hl_s$seed.json \
    && mv benchmarks/.p512hl_s$seed.json benchmarks/planning512_halflr_s$seed.json \
    || echo "[r3c] seed $seed eval failed" >&2
done

echo "=== r3c summary ===" >&2
for seed in 0 1 2; do
  [ -f benchmarks/planning512_halflr_s$seed.json ] \
    && echo "seed $seed: $(cat benchmarks/planning512_halflr_s$seed.json)"
done
echo "=== r3c queue done ==="
