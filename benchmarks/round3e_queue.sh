#!/bin/bash
# r3e: apply the 6-seed-confirmed half-LR recipe (cosine + g_lr 5e-4)
# to the OTHER families — the imagecond/planning512 studies showed it
# halves seed spread at equal-or-better mean; this measures whether the
# same G/D-balance mechanism transfers to (a) goalcond pointmass (the
# contract preset) and (b) the three beyond-reference env families,
# whose cosine controls are already in convergence_{goalcond_cosine_
# seeds,unicycle_cosine,reacher_cosine,quadrotor_cosine}.json.
cd "$(dirname "$0")/.."
set -u
export CONVERGENCE_CHUNK_CAP=${CONVERGENCE_CHUNK_CAP:-1250}

if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[r3e] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

HEALTH_TAG=r3e
source benchmarks/wait_healthy.sh

run_study () {  # $1=out-json  $2=env
  local out=$1 env=$2
  echo "=== $env goalcond half-LR, 3 seeds x 150k ===" >&2
  for attempt in 1 2 3; do
    wait_healthy
    CONVERGENCE_OUT=benchmarks/$out \
      timeout 7200 python benchmarks/convergence_fixed.py 150000 5000 \
      "goalcond:{\"env\":\"$env\",\"lr_schedule\":\"cosine\",\"g_lr\":0.0005,\"steps\":150000,\"seed\":0}" \
      "goalcond:{\"env\":\"$env\",\"lr_schedule\":\"cosine\",\"g_lr\":0.0005,\"steps\":150000,\"seed\":1}" \
      "goalcond:{\"env\":\"$env\",\"lr_schedule\":\"cosine\",\"g_lr\":0.0005,\"steps\":150000,\"seed\":2}" \
      && { echo "[r3e] $env done" >&2; return 0; }
    echo "[r3e] $env attempt $attempt failed; health-gating retry" >&2
  done
}

run_control () {  # reacher's cosine CONTROL never landed (killed by the
  # 14h worker outage) — run it here so the half-LR row has its control.
  echo "=== reacher goalcond cosine control, 3 seeds x 150k ===" >&2
  for attempt in 1 2 3; do
    wait_healthy
    CONVERGENCE_OUT=benchmarks/convergence_reacher_cosine.json \
      timeout 7200 python benchmarks/convergence_fixed.py 150000 5000 \
      'goalcond:{"env":"reacher","lr_schedule":"cosine","steps":150000,"seed":0}' \
      'goalcond:{"env":"reacher","lr_schedule":"cosine","steps":150000,"seed":1}' \
      'goalcond:{"env":"reacher","lr_schedule":"cosine","steps":150000,"seed":2}' \
      && { echo "[r3e] reacher control done" >&2; return 0; }
    echo "[r3e] reacher control attempt $attempt failed" >&2
  done
}

run_control
run_study convergence_goalcond_halflr.json pointmass
run_study convergence_unicycle_halflr.json unicycle
run_study convergence_reacher_halflr.json reacher
run_study convergence_quadrotor_halflr.json quadrotor

echo "=== r3e summary ===" >&2
python benchmarks/summarize_convergence.py \
  benchmarks/convergence_goalcond_halflr.json \
  benchmarks/convergence_unicycle_halflr.json \
  benchmarks/convergence_reacher_halflr.json \
  benchmarks/convergence_quadrotor_halflr.json 2>&1 || true
echo "=== r3e queue done ==="
