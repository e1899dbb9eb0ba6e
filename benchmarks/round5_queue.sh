#!/bin/bash
# Round-5 chip queue — the VERDICT r4 directives not already covered by
# the still-running round-4 chain (r4s seed-2 -> r4t dreset_late +
# ilqr-teacher -> r4u sharded-planner proof -> r4q transformer matrix):
#
# o1. TPU overload leg with max_pending 8 < 32 connections (VERDICT #7):
#     chip-proves the `overloaded` admission path where the r4 leg could
#     only shed via deadline_ms.  Small, so it runs first.
# s3. Seed 3 of the flagship quadrotor cem+trajopt distillation
#     (VERDICT #2): completes the n>=3 band (s0 committed, s1 committed,
#     s2 in the r4s chain).
# k1/k2. Expert iteration on the kinematic families with the trajopt-60
#     teacher, adjudicated on the OPEN-LOOP SCORE axis (VERDICT #3,
#     --track eval_plan_best_score): success is at ceiling there
#     (0.997/0.980); the quantity trajopt moves is mean best score
#     (unicycle 0.5349 one-shot vs 0.0833 trajopt-60).  Protocol matches
#     the quadrotor win (2048 x 8 rows/round); warm starts trimmed
#     (64/48) to keep each 128-scene recording dispatch well under the
#     ~1-minute worker wall.
# sd. Self-distillation, the twelfth stabiliser avenue (VERDICT #5):
#     benchmarks/selfdistill_bench.py docstring has the full rationale.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r5
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r5

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r5] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r5/${name}.log" 2>&1 \
      && { echo "[r5] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r5] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

SERVING_LEGS=overload_mp8 SERVING_BENCH_WORKDIR=checkpoints/planning512 \
  SERVING_OUT=benchmarks/serving_results_mp8.json \
  leg serving_mp8 3600 python benchmarks/serving_bench.py

leg distill_quad_ct_s3 9000 python -m ndivplanning_tpu.cli distill \
  --workdir checkpoints/quadrotor150k \
  --distill-workdir /tmp/r5/distill_quad_ct_s3 \
  --rounds 2 --scenes-per-round 2048 --per-scene 8 --suite-size 512 \
  --planner cem+trajopt --seed 3
grep '^{"rounds"' /tmp/r5/distill_quad_ct_s3.log | tail -1 \
  > benchmarks/distill_quad_ct_s3.json || true

leg distill_unicycle_trajopt 10000 python -m ndivplanning_tpu.cli distill \
  --workdir checkpoints/unicycle150k \
  --distill-workdir /tmp/r5/distill_unicycle_trajopt \
  --rounds 2 --scenes-per-round 2048 --per-scene 8 --suite-size 512 \
  --planner trajopt --mpc-candidates 64 --track eval_plan_best_score
grep '^{"rounds"' /tmp/r5/distill_unicycle_trajopt.log | tail -1 \
  > benchmarks/distill_unicycle_trajopt.json || true

leg distill_reacher_trajopt 10000 python -m ndivplanning_tpu.cli distill \
  --workdir checkpoints/reacher150k \
  --distill-workdir /tmp/r5/distill_reacher_trajopt \
  --rounds 2 --scenes-per-round 2048 --per-scene 8 --suite-size 512 \
  --planner trajopt --mpc-candidates 48 --track eval_plan_best_score
grep '^{"rounds"' /tmp/r5/distill_reacher_trajopt.log | tail -1 \
  > benchmarks/distill_reacher_trajopt.json || true

# tf. Transformer tuning matrix (VERDICT #4, third consecutive round):
#     folded in here from round4q_queue.sh so it runs at the judge's own
#     rank — after the seed-band + kinematic distills, before the
#     selfdistill soak.  bf16 + warmup 2k + cosine, g_lr {1e-4, 5e-5},
#     3 seeds x 100k goalcond.
export CONVERGENCE_CHUNK_CAP=2000
for lr in 0.0001 0.00005; do
  for seed in 0 1 2; do
    CONVERGENCE_OUT="benchmarks/convergence_tf_lr${lr}_s${seed}.json" \
      leg "tf_${lr}_${seed}" 6000 python benchmarks/convergence_fixed.py \
      100000 10000 \
      "goalcond:{\"g_arch\":\"transformer\",\"lr_schedule\":\"cosine\",\"compute_dtype\":\"bf16\",\"warmup_steps\":2000,\"g_lr\":${lr},\"seed\":${seed}}"
  done
done
unset CONVERGENCE_CHUNK_CAP

leg selfdistill 10000 python benchmarks/selfdistill_bench.py 100000 0 1 2

echo "=== r5 queue done ===" >&2
