#!/bin/bash
# Round-3 continuation queue (health-gated; see wait_healthy.sh and the
# CLAUDE.md outage notes).  Novel science first:
#   1. half-LR recipe seed confirmation (seeds 3-5): the g512_halflr
#      precedent showed a 3-seed +0.1 claim can evaporate at seeds 3-5,
#      and half-LR-at-base-width is now the candidate production recipe.
#   2. quadrotor closed-loop: train one 150k cosine checkpoint through
#      the CLI (so best-of-both + config.json land in a workdir), then
#      eval --mpc and open-loop eval on the SAME checkpoint — does the
#      receding horizon rescue the underactuated family (0.26 open)?
#   3. quarter-LR probe: is there more on the LR axis below 5e-4?
#   4. sharded-plan program on the real chip: compile + latency row.
cd "$(dirname "$0")/.."
set -u
export CONVERGENCE_CHUNK_CAP=${CONVERGENCE_CHUNK_CAP:-1250}

if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[r3b] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

HEALTH_TAG=r3b
source benchmarks/wait_healthy.sh

run() {  # run OUTFILE PRESET_SPECS...
  out=$1; shift
  for attempt in 1 2 3; do
    wait_healthy
    CONVERGENCE_OUT="benchmarks/$out" timeout 7200 python \
      benchmarks/convergence_fixed.py 150000 5000 "$@" \
      && { echo "[r3b] $out done" >&2; return 0; }
    echo "[r3b] $out attempt $attempt failed; health-gating retry" >&2
  done
  echo "[r3b] $out FAILED three times" >&2
}

echo "=== half-LR base width, confirmation seeds 3-5 ==="
run convergence_imagecond_halflr_s345.json \
  'imagecond:{"g_lr":0.0005,"lr_schedule":"cosine","steps":150000,"seed":3}' \
  'imagecond:{"g_lr":0.0005,"lr_schedule":"cosine","steps":150000,"seed":4}' \
  'imagecond:{"g_lr":0.0005,"lr_schedule":"cosine","steps":150000,"seed":5}'

echo "=== quadrotor: train 150k cosine checkpoint via CLI ==="
QWD=/tmp/ndivplanning_tpu/quadrotor_r3b
for attempt in 1 2 3; do
  wait_healthy
  timeout 7200 python -m ndivplanning_tpu.cli train --preset goalcond \
    --steps 150000 --workdir "$QWD" \
    --set env=quadrotor --set lr_schedule=cosine \
    --set log_every=1000 --set eval_every=5000 \
    && { echo "[r3b] quadrotor train done" >&2; break; }
  echo "[r3b] quadrotor train attempt $attempt failed" >&2
done

echo "=== quadrotor: open-loop vs closed-loop suite quality ==="
for attempt in 1 2 3; do
  wait_healthy
  if timeout 3600 python -m ndivplanning_tpu.cli eval --workdir "$QWD" \
       > benchmarks/.quad_open.tmp \
     && timeout 3600 python -m ndivplanning_tpu.cli eval --workdir "$QWD" \
       --mpc > benchmarks/.quad_mpc.tmp; then
    python - <<'EOF'
import json
open_ = json.load(open('benchmarks/.quad_open.tmp'))
mpc = json.load(open('benchmarks/.quad_mpc.tmp'))
json.dump({"open_loop": open_, "mpc": mpc},
          open('benchmarks/quadrotor_mpc_suite.json', 'w'), indent=1)
print(json.dumps({"open": open_.get("eval_success_rate"),
                  "mpc": mpc.get("eval_mpc_success_rate")}))
EOF
    rm -f benchmarks/.quad_open.tmp benchmarks/.quad_mpc.tmp
    echo "[r3b] quadrotor eval done" >&2; break
  fi
  echo "[r3b] quadrotor eval attempt $attempt failed" >&2
done

echo "=== quarter-LR probe, seeds 0-2 ==="
run convergence_imagecond_quarterlr.json \
  'imagecond:{"g_lr":0.00025,"lr_schedule":"cosine","steps":150000,"seed":0}' \
  'imagecond:{"g_lr":0.00025,"lr_schedule":"cosine","steps":150000,"seed":1}' \
  'imagecond:{"g_lr":0.00025,"lr_schedule":"cosine","steps":150000,"seed":2}'

echo "=== sharded-plan program on the real chip ==="
wait_healthy
timeout 3600 python benchmarks/sharded_plan_tpu.py \
  || echo "[r3b] sharded_plan_tpu failed" >&2

python benchmarks/summarize_convergence.py \
  benchmarks/convergence_imagecond_halflr_s345.json \
  benchmarks/convergence_imagecond_quarterlr.json 2>&1 || true

echo "=== r3b queue done ==="
