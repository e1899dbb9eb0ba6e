#!/bin/bash
# Re-run queue for the six soaks invalidated by the steps-horizon bug
# (BASELINE.md "Round-3 measurement bug: six soaks trained at LR=0 past
# 10k"): every run below set lr_schedule=cosine in its overrides but
# omitted `steps`, so the schedule decayed to zero at the preset
# default 10k instead of the soak's 150k horizon.  The harness now
# defaults its config horizon to the soak budget, and each override
# here ALSO pins `steps` explicitly for provenance.
#
# Sequential on the one dev chip; ~1.5-2 h per 3-seed study, ~10-12 h
# total — run overnight or across a round boundary.  Each study retries
# once on the tunnel's transient FailedPrecondition (CLAUDE.md).
cd "$(dirname "$0")/.."
set -u

# 1250-step chunks (4 per 5000-step eval window, one compiled shape):
# base imagecond is ~7 ms/step so 5000-step chunks sit at ~35 s, and the
# 512x2 capacity probes below are 2-3x slower per step — without a cap
# they would cross the ~1-minute single-dispatch limit that crashes the
# axon TPU worker (CLAUDE.md round-3 gotchas).  Extra fetch overhead is
# ~35 ms per chunk boundary: negligible against a 150k soak.
export CONVERGENCE_CHUNK_CAP=${CONVERGENCE_CHUNK_CAP:-1250}

run() {
  out=$1; shift
  for attempt in 1 2; do
    CONVERGENCE_OUT="benchmarks/$out" timeout 14400 python \
      benchmarks/convergence_fixed.py 150000 5000 "$@" \
      && return 0
    echo "[rerun] $out attempt $attempt failed; retrying" >&2
  done
  echo "[rerun] $out FAILED twice" >&2
}

seeds() {  # seeds OUTFILE OVERRIDES_JSON_WITHOUT_CLOSING_BRACE
  out=$1; ov=$2
  run "$out" \
    "imagecond:${ov},\"seed\":0}" \
    "imagecond:${ov},\"seed\":1}" \
    "imagecond:${ov},\"seed\":2}"
}

echo "=== cosine on SN+DiffAugment ==="
seeds convergence_imagecond_sn_diffaug_cosine.json \
  '{"d_spectral_norm":true,"diffaug":"shift,cutout","lr_schedule":"cosine","steps":150000'

echo "=== cosine on DiffAugment ==="
seeds convergence_imagecond_diffaug_cosine.json \
  '{"diffaug":"shift,cutout","lr_schedule":"cosine","steps":150000'

echo "=== capacity: G 512x2 ==="
seeds convergence_imagecond_g512.json \
  '{"g_hidden":[512,512],"lr_schedule":"cosine","steps":150000'

echo "=== capacity: G 512x2 at half LR ==="
seeds convergence_imagecond_g512_halflr.json \
  '{"g_hidden":[512,512],"g_lr":0.0005,"lr_schedule":"cosine","steps":150000'

echo "=== capacity: G 512x2 + D 512x2 ==="
seeds convergence_imagecond_g512_d512.json \
  '{"g_hidden":[512,512],"d_hidden":[512,512],"lr_schedule":"cosine","steps":150000'

echo "=== capacity: G 512x2 + wider encoder ==="
seeds convergence_imagecond_g512_enc.json \
  '{"g_hidden":[512,512],"encoder_features":[32,64,128],"lr_schedule":"cosine","steps":150000'

echo "=== invalidated-soak re-run queue done ==="
