"""Backward-kernel row-tile sweep for the fused NDiv kernel.

    python benchmarks/ndiv_tile_sweep.py [tiles...]

Round-2 measured: 2048-row tiles are 10-25% faster than 1024 when they
compile, but the BACKWARD kernel's simultaneous intermediates blow the
16 MB scoped-VMEM budget at 2048 (18.7 MB) while 1024 sits at ~9 MB.
The intermediate sizes (1280/1536/1792) were never tried.  This sweep
runs each candidate NDIV_BWD_ROW_TILE in a SUBPROCESS (the tile target
is read at module import; process isolation also contains Mosaic
VMEM-overflow compile failures) and measures the fwd+bwd grad scan at
the two contract shapes, same methodology as ndiv_kernel_bench.py
(device_get sync, scan-on-device, perturbed inputs to defeat CSE).

Writes benchmarks/ndiv_bwd_tile_sweep.json; a compile failure is
recorded as {"error": ...} for that tile, not a sweep abort.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

_CHILD_SRC = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
import jax
import jax.numpy as jnp
import numpy as np
from ndivplanning_tpu.ops.ndiv_pallas import ndiv_loss_fused, _plan_block

REPS = 200
rows = []
for b, k, dz, dx in [(256, 8, 2, 64), (256, 32, 2, 64)]:
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (b, k, dz))
    x = jax.random.normal(key, (b, k, dx))

    def gsum(zz, xx):
        g = jax.grad(lambda a, bb: ndiv_loss_fused(a, bb, 0.8),
                     argnums=(0, 1))

        def body(c, i):
            dz_, dx_ = g(zz + 1e-6 * i, xx + 1e-6 * i)
            return (c[0] + dz_.sum(), c[1] + dx_.sum()), None

        (sz, sx), _ = jax.lax.scan(body, (0.0, 0.0),
                                   jnp.arange(REPS, dtype=jnp.float32))
        return sz + sx

    f = jax.jit(gsum)
    out = float(np.asarray(f(z, x)))  # compile + first run, honest sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(f(z, x)))
        times.append((time.perf_counter() - t0) / REPS)
    per_call = float(np.median(times))
    pairs = b * k * (k - 1)
    rows.append({{"B": b, "k": k, "dz": dz, "dx": dx,
                  "row_tile_plan": _plan_block(b, k)[2],
                  "s_per_fwdbwd": per_call,
                  "gpairs_per_s": pairs / per_call / 1e9}})
print("SWEEPRESULT " + json.dumps(
    {{"tile": int(os.environ["NDIV_BWD_ROW_TILE"]),
      "backend": jax.default_backend(), "rows": rows}}))
"""


def main() -> None:
    tiles = [int(t) for t in sys.argv[1:]] or [1024, 1280, 1536, 1792,
                                               2048]
    child = _CHILD_SRC.format(root=os.path.dirname(HERE))
    results = []
    for tile in tiles:
        env = dict(os.environ, NDIV_BWD_ROW_TILE=str(tile))
        try:
            r = subprocess.run([sys.executable, "-c", child], env=env,
                               capture_output=True, text=True,
                               timeout=1800)
        except subprocess.TimeoutExpired:
            results.append({"tile": tile, "error": "timeout"})
            print(f"[sweep] tile {tile}: timeout", flush=True)
            continue
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("SWEEPRESULT ")), None)
        if r.returncode == 0 and line:
            rec = json.loads(line.removeprefix("SWEEPRESULT "))
            results.append(rec)
            print(f"[sweep] tile {tile}: " + " ".join(
                f"k{row['k']}={row['gpairs_per_s']:.2f}G"
                for row in rec["rows"]), flush=True)
        else:
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            results.append({"tile": tile, "error": " | ".join(tail)})
            print(f"[sweep] tile {tile}: FAILED ({tail[-1] if tail else '?'})",
                  flush=True)
        with open(os.path.join(HERE, "ndiv_bwd_tile_sweep.json"),
                  "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
