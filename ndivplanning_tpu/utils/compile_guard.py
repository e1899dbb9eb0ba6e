"""Compile-budget observability (SURVEY.md §7 / CLAUDE.md gotcha).

Remote XLA compiles cost 90-300 s each through the axon TPU tunnel, so a
change that quietly adds per-chunk-size (or per-request-shape) programs
is a production latency landmine.  :func:`count_compiles` counts actual
backend compilations inside a region via JAX's monitoring events, the
train loop logs the total per run, and tests/test_compile_budget.py
pins the default run's program count.
"""

from __future__ import annotations

import contextlib
import dataclasses

from jax import monitoring

try:  # private but stable constant; fall back to its literal value
    from jax._src.dispatch import BACKEND_COMPILE_EVENT
except Exception:  # pragma: no cover
    BACKEND_COMPILE_EVENT = "/jax/core/compile/backend_compile_duration"


@dataclasses.dataclass
class CompileCount:
    """Mutable record of backend compilations observed in a region.

    ``names``/``durations`` include EVERY program, down to the one-op
    helpers eager param-init dispatches (dozens of ~ms compiles).  What
    the budget actually guards is compile TIME, so ``major()`` filters
    to programs whose compile exceeded a threshold — the train chunk,
    eval, plan programs that cost 90-300 s each on the TPU tunnel.
    """

    count: int = 0
    names: list = dataclasses.field(default_factory=list)
    durations: list = dataclasses.field(default_factory=list)

    # jax-library helper programs dispatched eagerly during param/state
    # init — one compile each per run, never per-chunk, so they are not
    # the recompile hazard the budget guards.  On a loaded single-core
    # host their compile wall time can exceed any fixed threshold (a
    # 1-vCPU box measured _truncated_normal at >1 s), so major() must
    # classify by identity, not duration alone.
    _INIT_HELPERS = frozenset({
        "_truncated_normal", "_normal", "_uniform", "_randint",
        "_threefry_split", "_threefry_fold_in", "threefry_2x32",
        "_copy", "convert_element_type", "broadcast_in_dim", "iota",
    })

    def major(self, threshold_secs: float = 1.0) -> list:
        # 1.0 s separates cleanly on an unloaded host: one-op helpers
        # and PRNG utilities compile in <=0.4 s; real fused programs
        # (train chunk, evaluate, plan) take multiple seconds on CPU
        # and 90-300 s on the TPU tunnel.  Known init helpers are
        # excluded by name regardless of duration (see _INIT_HELPERS).
        out = []
        for n, d in zip(self.names, self.durations):
            base = n[4:-1] if n.startswith("jit(") and n.endswith(")") else n
            if d >= threshold_secs and base not in self._INIT_HELPERS:
                out.append(n)
        return out

    def total_secs(self) -> float:
        return float(sum(self.durations))


def start_compile_count():
    """Begin counting; returns ``(rec, stop_fn)`` — call ``stop_fn()``
    to unregister the listener (idempotent)."""
    rec = CompileCount()

    def listener(event: str, duration: float, **kwargs) -> None:
        if event == BACKEND_COMPILE_EVENT:
            rec.count += 1
            rec.names.append(kwargs.get("fun_name", "?"))
            rec.durations.append(duration)

    monitoring.register_event_duration_secs_listener(listener)
    stopped = [False]

    def stop() -> None:
        if not stopped[0]:
            stopped[0] = True
            monitoring.unregister_event_duration_listener(listener)

    return rec, stop


@contextlib.contextmanager
def count_compiles():
    """``with count_compiles() as rec: ...`` — ``rec.count`` is the
    number of XLA backend compilations (cache misses that reached the
    compiler) during the region; ``rec.names`` the program names."""
    rec, stop = start_compile_count()
    try:
        yield rec
    finally:
        stop()
