#!/bin/bash
# Round-4 leg C: the measurement queue for VERDICT items #4/#7/#5/#6,
# chained after the distill leg (WAIT_PID).  Health-gated per leg.
#
# c1. ADA (VERDICT #4): first a control seed with NO augmentation —
#     d_rt is now logged by every run, so this measures whether the
#     overfitting heuristic r_t = E[sign(D(real))] moves at all in the
#     infinite-synthetic-data regime, in the exact recipe whose late
#     collapse ADA is meant to fix (imagecond half-LR cosine).  Then
#     3 seeds x 150k with ADA driving shift+cutout probability.
# c2. iLQR/hybrid study (VERDICT #7): quadrotor 64 scenes, same-suite
#     oneshot/cem/cem+trajopt/ilqr rows (benchmarks/ilqr_bench.py).
# c3. NDiv kernel decomposition A/B (VERDICT #5): block vs group-packed
#     vs jnp at contract shapes (benchmarks/ndiv_kernel_bench.py).
# c4. Transformer honest tuning pass (VERDICT #6): bf16 + warmup 2k +
#     g_lr {1e-4, 5e-5}, 3 seeds x 100k goalcond, cosine.
cd "$(dirname "$0")/.."
set -u
if [[ -n "${WAIT_PID:-}" ]]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
HEALTH_TAG=r4c
source benchmarks/wait_healthy.sh
mkdir -p /tmp/r4

leg() {  # leg <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  for attempt in 1 2 3; do
    wait_healthy
    echo "[r4c] $name attempt $attempt $(date -u +%H:%M:%S)" >&2
    timeout "$tmo" "$@" >> "/tmp/r4/${name}.log" 2>&1 \
      && { echo "[r4c] $name done $(date -u +%H:%M:%S)" >&2; return 0; }
    echo "[r4c] $name attempt $attempt failed" >&2
  done
  return 1
}

# c1a: control — does the heuristic move at all? (1 seed, no aug)
CONVERGENCE_OUT=benchmarks/convergence_ada_control.json \
  leg ada_control 4000 python benchmarks/convergence_fixed.py 150000 5000 \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"seed":0}'

# c1b: ADA 3 seeds (target 0.6 = the canonical setting; shift+cutout).
CONVERGENCE_OUT=benchmarks/convergence_ada.json \
  leg ada_soak 12000 python benchmarks/convergence_fixed.py 150000 5000 \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.6,"seed":0}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.6,"seed":1}' \
  'imagecond:{"lr_schedule":"cosine","g_lr":0.0005,"diffaug":"shift,cutout","ada_target":0.6,"seed":2}'

# c2: iLQR + CEM->trajopt same-suite quadrotor study.
leg ilqr_study 7200 python benchmarks/ilqr_bench.py 64 quadrotor150k

# c3: kernel decomposition A/B at contract shapes.
leg kernel_ab 3600 python benchmarks/ndiv_kernel_bench.py

# c3b: serving round-4 legs — above-capacity admission control
# (VERDICT #3) and reload-under-fire (VERDICT #8) over the served
# 0.833 planning512 model, like the r3p rows.
SERVING_LEGS=overload,reload \
SERVING_BENCH_WORKDIR=checkpoints/planning512 \
SERVING_OUT=benchmarks/serving_results_r4.json \
  leg serving_r4 5400 python benchmarks/serving_bench.py 20

# c4: transformer tuning matrix (bf16, warmup, 2 LRs x 3 seeds).
export CONVERGENCE_CHUNK_CAP=2000
for lr in 0.0001 0.00005; do
  for seed in 0 1 2; do
    CONVERGENCE_OUT="benchmarks/convergence_tf_lr${lr}_s${seed}.json" \
      leg "tf_${lr}_${seed}" 6000 python benchmarks/convergence_fixed.py \
      100000 10000 \
      "goalcond:{\"g_arch\":\"transformer\",\"lr_schedule\":\"cosine\",\"compute_dtype\":\"bf16\",\"warmup_steps\":2000,\"g_lr\":${lr},\"seed\":${seed}}"
  done
done

echo "=== r4c queue done ===" >&2
