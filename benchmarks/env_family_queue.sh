#!/bin/bash
# On-chip env-family rollout bench, chained behind the quadrotor soak
# (WAIT_PID): one score_candidates program per family at the contract
# 1000-candidate scale -> benchmarks/env_family_results.json (the
# per-family dynamics-cost row for BASELINE.md).
cd "$(dirname "$0")/.."
set -u

if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[env-family] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

HEALTH_TAG=env_family
source benchmarks/wait_healthy.sh

OUT=benchmarks/env_family_results.json
for attempt in 1 2 3; do
  wait_healthy
  if timeout 3600 python benchmarks/env_family_bench.py 1000 20 \
      > "$OUT.tmp" 2>/tmp/env_family_bench.err; then
    mv "$OUT.tmp" "$OUT"
    echo "[env-family] bench done -> $OUT" >&2
    break
  fi
  echo "[env-family] attempt $attempt failed; health-gating retry" >&2
done

echo "=== env family queue done ==="
