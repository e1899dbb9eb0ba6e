#!/bin/bash
# LeCam stabiliser soaks (config.py lecam_weight; BASELINE.md round-3
# stabiliser sweep).  LeCam (Tseng et al. 2021) anchors D's real/fake
# logits to EMAs of the opposite class' mean — it bounds the real-fake
# gap D can open, which is exactly the measured >70k imagecond collapse
# mode.  Two weights on the cosine recipe (the honest-frontier winner),
# same 3-seed x 150k frozen-suite protocol as every other stabiliser
# study.  Sequential on the one dev chip, ~1.5-2 h per study.
cd "$(dirname "$0")/.."
set -u

# If a prior queue is still on the chip, wait for it (PID file written
# by the launcher).  The chip serialises programs anyway; waiting keeps
# timing honest and avoids host-RAM pressure from two harnesses.
if [[ -n "${WAIT_PID:-}" ]]; then
  echo "[lecam] waiting for pid $WAIT_PID to exit" >&2
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi

export CONVERGENCE_CHUNK_CAP=${CONVERGENCE_CHUNK_CAP:-1250}

run() {
  out=$1; shift
  for attempt in 1 2; do
    CONVERGENCE_OUT="benchmarks/$out" timeout 14400 python \
      benchmarks/convergence_fixed.py 150000 5000 "$@" \
      && return 0
    echo "[lecam] $out attempt $attempt failed; retrying" >&2
  done
  echo "[lecam] $out FAILED twice" >&2
}

seeds() {  # seeds OUTFILE OVERRIDES_JSON_WITHOUT_CLOSING_BRACE
  out=$1; ov=$2
  run "$out" \
    "imagecond:${ov},\"seed\":0}" \
    "imagecond:${ov},\"seed\":1}" \
    "imagecond:${ov},\"seed\":2}"
}

echo "=== LeCam 0.1 on cosine ==="
seeds convergence_imagecond_lecam01_cosine.json \
  '{"lecam_weight":0.1,"lr_schedule":"cosine","steps":150000'

echo "=== LeCam 0.3 on cosine ==="
seeds convergence_imagecond_lecam03_cosine.json \
  '{"lecam_weight":0.3,"lr_schedule":"cosine","steps":150000'

echo "=== LeCam soak queue done ==="
