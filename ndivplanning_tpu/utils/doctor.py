"""Environment diagnosis: one JSON report of everything that decides
whether this install can train/serve, probed SAFELY.

The dev-chip runtime has two hang modes a naive report would trip
(CLAUDE.md round-3 gotchas): ``jax.devices()`` BLOCKS in-process while
the remote worker is down, and a client caught mid-dispatch hangs with
no error.  So the backend probe here never touches a backend in the
calling process — it runs a tiny jit in a timeout-bounded subprocess
(the same discipline as bench.py's health gate and
benchmarks/wait_healthy.sh) and reports healthy / unhealthy / timeout
as data instead of hanging the CLI.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

# Executed in a fresh subprocess: inherits sitecustomize (so it probes
# the REAL default backend, tunnel and all) unless a platform override
# pins it to CPU first.  Prints one JSON line on success.
_PROBE_SRC = """
import json, time
{platform_pin}
import jax, numpy as np
t0 = time.perf_counter()
x = jax.numpy.ones((8, 8))
val = float(np.asarray(jax.jit(lambda a: (a @ a).sum())(x)))
elapsed = time.perf_counter() - t0
devs = jax.devices()
print(json.dumps({{
    "platform": devs[0].platform,
    "device_kind": devs[0].device_kind,
    "n_devices": len(devs),
    "probe_value_ok": abs(val - 512.0) < 1e-3,
    "compile_execute_fetch_s": round(elapsed, 3),
}}))
"""

_CPU_PIN = (
    "import jax\n"
    "jax.config.update('jax_platforms', 'cpu')\n"
    "from jax.extend.backend import clear_backends; clear_backends()\n"
)


def probe_backend(timeout_s: float = 120.0,
                  platform: str | None = None) -> dict:
    """Run the tiny compile+execute+fetch probe in a subprocess.

    Returns ``{"status": "healthy", ...probe fields}`` or
    ``{"status": "unhealthy"|"timeout", ...}`` — never raises, never
    hangs past ``timeout_s``.
    """
    pin = _CPU_PIN if platform == "cpu" else ""
    src = _PROBE_SRC.format(platform_pin=pin)
    t0 = time.perf_counter()
    try:
        r = subprocess.run([sys.executable, "-c", src],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "timeout_s": timeout_s,
                "hint": "backend init or dispatch hung — on the axon "
                        "tunnel this means the remote worker is down "
                        "(recovery has been observed to take 10 min to "
                        "hours); retry later or force the CPU backend"}
    wall = round(time.perf_counter() - t0, 3)
    if r.returncode != 0:
        return {"status": "unhealthy", "wall_s": wall,
                "stderr_tail": r.stderr.strip().splitlines()[-3:]}
    out = json.loads(r.stdout.strip().splitlines()[-1])
    return {"status": "healthy", "wall_s": wall, **out}


def doctor_report(probe: bool = True, probe_timeout_s: float = 120.0,
                  probe_platform: str | None = None) -> dict:
    """Assemble the full environment report (pure host introspection
    plus the optional subprocess backend probe)."""
    import flax
    import jax

    import ndivplanning_tpu
    from ndivplanning_tpu.data.native import _LIB_PATH, native_available

    report: dict = {
        "package_version": getattr(ndivplanning_tpu, "__version__", "dev"),
        "python": sys.version.split()[0],
        "jax": jax.__version__,
        "flax": flax.__version__,
        # The *configured* platform preference — read from config, which
        # does NOT initialise a backend (safe while the worker is down).
        "configured_platforms": jax.config.jax_platforms or "(auto)",
    }
    try:
        import optax
        report["optax"] = optax.__version__
    except Exception:  # pragma: no cover - optax is baked in
        report["optax"] = None
    try:
        import orbax.checkpoint as ocp
        report["orbax"] = ocp.__version__
    except Exception:  # pragma: no cover
        report["orbax"] = None

    # Native host data plane: builds lazily on first use; report both
    # the availability and whether the .so is already on disk.
    import os
    report["native_host_plane"] = {
        "available": bool(native_available()),
        "lib_built": os.path.exists(_LIB_PATH),
    }

    if probe:
        report["backend_probe"] = probe_backend(probe_timeout_s,
                                                probe_platform)
        status = report["backend_probe"]["status"]
        if status == "healthy":
            # Pallas NDiv compiles via Mosaic only on real TPU; CPU runs
            # the interpreter (ops/ndiv_pallas.py::_should_interpret).
            on_tpu = report["backend_probe"]["platform"] == "tpu"
            report["pallas_ndiv_mode"] = "mosaic" if on_tpu else "interpret"
        report["healthy"] = status == "healthy"
    return report
