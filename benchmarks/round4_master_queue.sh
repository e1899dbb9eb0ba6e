#!/bin/bash
# Round-4 master measurement queue (rebuilt after the 09:00-10:00 UTC
# worker outage hung the first distill leg mid-dispatch — the
# documented no-error hang class, CLAUDE.md round 3).  One chain, every
# leg health-gated; wait_healthy loops through outages of any length.
#
# Order: cheap/high-value first so an outage mid-queue costs the least.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r4m
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4

leg() {  # leg <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r4m] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r4/${name}.log" 2>&1 \
      && { echo "[r4m] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r4m] $name attempt $attempt rc=$? $(date -u +%H:%M:%S)" >&2
  done
  return 1
}

# 1. ADA: control heuristic measurement (1 seed) + 3-seed soak.
CONVERGENCE_OUT=benchmarks/convergence_ada_control.json \
  leg ada_control 4000 python benchmarks/convergence_fixed.py 150000 5000 \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"seed":0}'

CONVERGENCE_OUT=benchmarks/convergence_ada.json \
  leg ada_soak 12000 python benchmarks/convergence_fixed.py 150000 5000 \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.6,"seed":0}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.6,"seed":1}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.6,"seed":2}'

# 2. iLQR + CEM->trajopt same-suite quadrotor study.
leg ilqr_study 7200 python benchmarks/ilqr_bench.py 64 quadrotor150k

# 3. Kernel decomposition A/B at contract shapes.
leg kernel_ab 3600 python benchmarks/ndiv_kernel_bench.py

# 4. Serving round-4 legs (admission control above capacity + reload
#    under fire) over the served planning512 model.
SERVING_LEGS=overload,reload \
SERVING_BENCH_WORKDIR=checkpoints/planning512 \
SERVING_OUT=benchmarks/serving_results_r4.json \
  leg serving_r4 5400 python benchmarks/serving_bench.py 20

# 5. planning512 expert-iteration leg (re-run; per-scene 4 for
#    multimodal targets + the diversity guard).
rm -rf /tmp/r4/distill_planning512
leg distill_planning512 9000 python -m ndivplanning_tpu.cli distill \
  --workdir checkpoints/planning512 \
  --distill-workdir /tmp/r4/distill_planning512 \
  --rounds 2 --scenes-per-round 2048 --per-scene 4 --suite-size 512 \
  --mpc-candidates 256 --mpc-replan 8
grep '^{"rounds"' /tmp/r4/distill_planning512.log | tail -1 > benchmarks/distill_planning512.json || true

# 6. Quadrotor distill, round 2 recipe: per-scene 8 + diversity guard
#    (the r4a run collapsed diversity at per_scene=1).
leg distill_quad_ps8 9000 python -m ndivplanning_tpu.cli distill \
  --workdir checkpoints/quadrotor150k \
  --distill-workdir /tmp/r4/distill_quad_ps8 \
  --rounds 2 --scenes-per-round 2048 --per-scene 8 --suite-size 512 \
  --mpc-candidates 256 --mpc-replan 8
grep '^{"rounds"' /tmp/r4/distill_quad_ps8.log | tail -1 > benchmarks/distill_quad_ps8.json || true

# 7. Transformer tuning matrix (bf16, warmup 2k, 2 LRs x 3 seeds).
export CONVERGENCE_CHUNK_CAP=2000
for lr in 0.0001 0.00005; do
  for seed in 0 1 2; do
    CONVERGENCE_OUT="benchmarks/convergence_tf_lr${lr}_s${seed}.json" \
      leg "tf_${lr}_${seed}" 6000 python benchmarks/convergence_fixed.py \
      100000 10000 \
      "goalcond:{\"g_arch\":\"transformer\",\"lr_schedule\":\"cosine\",\"compute_dtype\":\"bf16\",\"warmup_steps\":2000,\"g_lr\":${lr},\"seed\":${seed}}"
  done
done

echo "=== r4m queue done ===" >&2
