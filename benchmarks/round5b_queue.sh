#!/bin/bash
# Round-5 RESUME queue — the round5_queue.sh legs that never produced
# artifacts before the machine was recycled mid-round (o1 + s3 completed
# and are committed; /tmp/r5 logs were wiped with the box).  Same legs,
# same judge-rank order:
#   k1/k2. kinematic score-axis expert iteration (VERDICT r4 #3)
#   tf.    transformer tuning matrix (VERDICT r4 #4, 4th consecutive round)
#   sd.    self-distillation, twelfth stabiliser avenue (VERDICT r4 #5)
cd "$(dirname "$0")/.."
set -u
HEALTH_TAG=r5b
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r5

leg() {
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r5b] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r5/${name}.log" 2>&1 \
      && { echo "[r5b] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r5b] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

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

export CONVERGENCE_CHUNK_CAP=2000
for lr in 0.0001 0.00005; do
  for seed in 0 1 2; do
    out="benchmarks/convergence_tf_lr${lr}_s${seed}.json"
    [[ -s "$out" ]] && continue
    CONVERGENCE_OUT="$out" \
      leg "tf_${lr}_${seed}" 6000 python benchmarks/convergence_fixed.py \
      100000 10000 \
      "goalcond:{\"g_arch\":\"transformer\",\"lr_schedule\":\"cosine\",\"compute_dtype\":\"bf16\",\"warmup_steps\":2000,\"g_lr\":${lr},\"seed\":${seed}}"
  done
done
unset CONVERGENCE_CHUNK_CAP

leg selfdistill 10000 python benchmarks/selfdistill_bench.py 100000 0 1 2

echo "=== r5b queue done ===" >&2
