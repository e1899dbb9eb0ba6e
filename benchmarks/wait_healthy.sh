# Shared chip health gate — source this, then call wait_healthy.
#
# The axon TPU worker can crash and stay down for hours; a client caught
# mid-dispatch HANGS and one starting during recovery dies at backend
# init (CLAUDE.md round 3).  Probe with a tiny timeout-bounded program
# in a subprocess and sleep-loop until it passes.  bench.py carries the
# same logic in python (_wait_for_healthy_backend) for its standalone
# driver invocation.
wait_healthy() {
  local n=0 tag="${HEALTH_TAG:-queue}"
  while true; do
    if timeout 180 python -c '
import jax, numpy as np
x = jax.numpy.ones((8, 8))
print(float(np.asarray(jax.jit(lambda a: (a @ a).sum())(x))))
' >/dev/null 2>&1; then
      echo "[$tag] chip healthy" >&2
      return 0
    fi
    n=$((n + 1))
    echo "[$tag] chip unhealthy (probe $n), sleeping 120s" >&2
    sleep 120
  done
}
