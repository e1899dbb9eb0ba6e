#!/bin/bash
# r3g: same-session A/B of the joint fwd+grad kernel vs the two-kernel
# scheme, with the FIXED value_and_grad bench (the old jax.grad bench
# let XLA DCE the forward pallas_call, so its "fwdbwd" was bwd-only).
cd "$(dirname "$0")/.."
set -u

if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[r3g] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

HEALTH_TAG=r3g
source benchmarks/wait_healthy.sh

echo "=== two-kernel scheme (NDIV_JOINT=0) ===" >&2
for attempt in 1 2 3; do
  wait_healthy
  NDIV_JOINT=0 timeout 3600 python benchmarks/ndiv_kernel_bench.py \
    && { cp benchmarks/ndiv_kernel_results.json \
            benchmarks/ndiv_kernel_results_twokernel.json; break; }
  echo "[r3g] two-kernel attempt $attempt failed" >&2
done

echo "=== joint kernel (NDIV_JOINT=1) ===" >&2
for attempt in 1 2 3; do
  wait_healthy
  timeout 3600 python benchmarks/ndiv_kernel_bench.py && break
  echo "[r3g] joint attempt $attempt failed" >&2
done

echo "=== r3g queue done ==="
