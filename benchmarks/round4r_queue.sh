#!/bin/bash
# Round-4 leg R: compound the quadrotor expert-iteration win.
#   1. Extend cem+trajopt distillation to rounds 2-3 (round 1 still
#      +0.035 — not saturated; round-granular resume re-uses rounds 0-1
#      from /tmp/r4/distill_quad_ct and runs only the new rounds).
#   2. Re-run the full open-loop planner ladder (oneshot/CEM/hybrid/
#      iLQR-36) over the LATEST ACCEPTED distilled generator: the
#      distilled manifold should give every warm-start-based planner a
#      better starting point (the compounding check).
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r4r
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r4r] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r4/${name}.log" 2>&1 \
      && { echo "[r4r] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r4r] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

leg distill_quad_ct_ext 9000 python -m ndivplanning_tpu.cli distill \
  --workdir checkpoints/quadrotor150k \
  --distill-workdir /tmp/r4/distill_quad_ct \
  --rounds 4 --scenes-per-round 2048 --per-scene 8 --suite-size 512 \
  --planner cem+trajopt
grep '^{"rounds"' /tmp/r4/distill_quad_ct_ext.log | tail -1 \
  > benchmarks/distill_quad_ct_ext.json || true

# Latest ACCEPTED round's workdir = the distilled generator to study.
BESTDIR=$(python - <<'EOF'
import json, os
root = "/tmp/r4/distill_quad_ct"
best = None
for d in sorted(os.listdir(root)):
    row = os.path.join(root, d, "report_row.json")
    if os.path.isfile(row) and json.load(open(row)).get("accepted"):
        best = os.path.join(root, d)
print(best or "")
EOF
)
echo "[r4r] distilled ladder target: $BESTDIR" >&2
if [[ -n "$BESTDIR" ]]; then
  ILQR_ITERS=36 ILQR_OUT=benchmarks/ilqr_results_distilled.json \
    leg ilqr_distilled 7200 python benchmarks/ilqr_bench.py 64 "$BESTDIR"
fi

echo "=== r4r queue done ===" >&2
