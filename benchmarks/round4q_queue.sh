#!/bin/bash
# Round-4 leg Q: the transformer tuning matrix, moved to the END of the
# chain (it is the longest block; ADA/dreset/ilqr/distill legs outrank
# it for the round).  bf16 + warmup 2k + cosine, g_lr {1e-4, 5e-5},
# 3 seeds x 100k goalcond (VERDICT #6).
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r4q
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r4q] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r4/${name}.log" 2>&1 \
      && { echo "[r4q] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r4q] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

export CONVERGENCE_CHUNK_CAP=2000
for lr in 0.0001 0.00005; do
  for seed in 0 1 2; do
    CONVERGENCE_OUT="benchmarks/convergence_tf_lr${lr}_s${seed}.json" \
      leg "tf_${lr}_${seed}" 6000 python benchmarks/convergence_fixed.py \
      100000 10000 \
      "goalcond:{\"g_arch\":\"transformer\",\"lr_schedule\":\"cosine\",\"compute_dtype\":\"bf16\",\"warmup_steps\":2000,\"g_lr\":${lr},\"seed\":${seed}}"
  done
done

echo "=== r4q queue done ===" >&2
