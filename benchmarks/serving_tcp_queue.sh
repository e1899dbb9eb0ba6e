#!/bin/bash
# On-chip serving bench over the deployable 0.833 checkpoint, chained
# behind the reacher queue (WAIT_PID): re-measures the full serving
# matrix — single/burst/sustained pipes PLUS the round-3 additions
# (sustained_tcp transport rows and concurrent_tcp cross-client
# dynamic-batching rows, 8 clients) — so BASELINE.md's serving entry
# can quote TPU numbers for the TCP path and the cross-batch win
# (dispatch-overhead amortisation is the whole point on the ~35 ms
# tunnel; the CPU smoke in docs/deployment.md cannot show it).
cd "$(dirname "$0")/.."
set -u

if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[serving-tcp] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

HEALTH_TAG=serving_tcp
source benchmarks/wait_healthy.sh

OUT=benchmarks/serving_results_tcp_r3.json
for attempt in 1 2 3; do
  wait_healthy
  if SERVING_BENCH_WORKDIR=checkpoints/planning512 \
      timeout 3600 python benchmarks/serving_bench.py 20 20 45 \
      > "$OUT.tmp" 2>/tmp/serving_tcp_bench.err; then
    mv "$OUT.tmp" "$OUT"
    echo "[serving-tcp] bench done -> $OUT" >&2
    break
  fi
  echo "[serving-tcp] attempt $attempt failed; health-gating retry" >&2
done

echo "=== serving tcp queue done ==="
