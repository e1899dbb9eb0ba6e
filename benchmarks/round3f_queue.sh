#!/bin/bash
# r3f (chained behind r3e via WAIT_PID): measure the JOINT fwd+grad
# NDiv kernel on the real chip — kernel-level pairs/s (vs the previous
# fwd-kernel+bwd-kernel scheme: 1.40 G pairs/s at B256 k32, 1.58x jnp)
# and the pod_dp step-level effect (NDiv is ~half that step's time).
cd "$(dirname "$0")/.."
set -u

if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[r3f] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

HEALTH_TAG=r3f
source benchmarks/wait_healthy.sh

echo "=== ndiv kernel bench (joint path) ===" >&2
for attempt in 1 2 3; do
  wait_healthy
  timeout 3600 python benchmarks/ndiv_kernel_bench.py \
    && { echo "[r3f] kernel bench done" >&2; break; }
  echo "[r3f] kernel bench attempt $attempt failed" >&2
done

echo "=== pod_dp step timing (joint path) ===" >&2
for attempt in 1 2 3; do
  wait_healthy
  timeout 3600 python - <<'PY' && { echo "[r3f] pod step done" >&2; break; }
import json, os, sys
sys.path.insert(0, "benchmarks")
from extended_bench import tpu_config
out = {
    "pod_dp_tpu_f32_joint": tpu_config("pod_dp", chunk=50, compute_dtype="f32"),
    "pod_dp_tpu_bf16_joint": tpu_config("pod_dp", chunk=50, compute_dtype="bf16"),
}
with open("benchmarks/pod_step_joint.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
PY
  echo "[r3f] pod step attempt $attempt failed" >&2
done

echo "=== r3f queue done ==="
