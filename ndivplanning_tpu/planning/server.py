"""Planning server: JSON-lines request loop over a trained checkpoint.

The serving shape of sim-in-the-loop planning (SURVEY.md §3.3 as a
service): one process holds the compiled plan program (latents ->
generator -> 1k vmapped rollouts -> best/diverse selection) and answers
scene requests on stdin/stdout, one JSON object per line.

Request:  {"start": [x, y], "goal": [x, y],
           "obstacles": [[cx, cy, r], ...],        (obstacles optional)
           "mpc": true}                             (optional: closed loop)
Response: {"best_traj": [[x, y] * horizon], "best_score": s,
           "best_reached": 0|1, "diverse_trajs": [...],
           "latency_ms": t, "batch_size": n}
MPC resp: {"path": [[x, y] * 64], "reached": 0|1, "collided": 0|1,
           "n_replans": 8, "latency_ms": t, "batch_size": n}

A literal ``stats`` line is answered with the process-level serving
counters (dispatches, requests, mean dispatch batch, pad fraction) —
the observability probe for monitoring cross-batch efficiency live.

Batched serving
---------------
Requests coalesce into ONE ``plan_batch`` dispatch (vmap over scenes)
instead of one dispatch each:

- a line that is a JSON *array* of requests is answered with a JSON
  array of responses, planned in one dispatch — the deterministic
  batching path for throughput clients;
- a burst of separate lines is drained best-effort (``select`` on real
  pipes; direct read-ahead on in-memory streams) and coalesced.

Scene batches are padded up to a small set of bucket sizes
({1, 2, 4, 8, 16} by default) so the jit cache holds at most
``len(buckets)`` programs — compiles are 90-300 s on the TPU tunnel, so
per-burst-size shapes would be a latency landmine.  Per-request errors
(bad JSON, malformed scenes) are answered in place without failing the
batch.  The first request pays the compile; every later request is one
dispatch (scenes are fixed-capacity pytrees, so all requests share the
bucket's static shape).
"""

from __future__ import annotations

import functools
import io
import json
import os
import queue
import select
import sys
import threading
import time
from typing import IO

import jax
import jax.numpy as jnp
import numpy as np

from ndivplanning_tpu.data.scenes import rasterize_scene
from ndivplanning_tpu.envs.types import Scene
from ndivplanning_tpu.planning.planner import plan_batch
from ndivplanning_tpu.train.state import TrainState
from ndivplanning_tpu.utils.config import Config

BUCKETS = (1, 2, 4, 8, 16)

# Process-level serving counters (see the "stats" request line): updated
# by every dispatch path (direct, coalesced, cross-batched), read by any
# connection.  A plain dict + lock — the counters are host-side
# bookkeeping, never traced.
_STATS_LOCK = threading.Lock()
SERVING_STATS = {"dispatches": 0, "requests": 0, "mpc_requests": 0,
                 "padded_slots": 0, "auto_reloads": 0, "started_at": None,
                 "shed_requests": 0, "expired_requests": 0}


def _record_load_control(shed: int = 0, expired: int = 0) -> None:
    """Admission-control counters: requests refused at the queue door
    (``overloaded``) and requests dropped at dispatch time for blowing
    their queueing deadline (``deadline_exceeded``)."""
    with _STATS_LOCK:
        SERVING_STATS["shed_requests"] += shed
        SERVING_STATS["expired_requests"] += expired


def _record_dispatch(n_real: int, bucket: int, mpc: bool) -> None:
    with _STATS_LOCK:
        SERVING_STATS["dispatches"] += 1
        SERVING_STATS["requests"] += n_real
        if mpc:
            SERVING_STATS["mpc_requests"] += n_real
        SERVING_STATS["padded_slots"] += bucket - n_real
        if SERVING_STATS["started_at"] is None:
            SERVING_STATS["started_at"] = time.time()


def serving_stats() -> dict:
    """Snapshot of the process-level serving counters: total dispatches
    and requests, closed-loop share, mean dispatch batch (cross-batch
    efficiency at a glance), pad overhead, and uptime."""
    with _STATS_LOCK:
        s = dict(SERVING_STATS)
    d = max(s["dispatches"], 1)
    return {
        "dispatches": s["dispatches"],
        "requests": s["requests"],
        "mpc_requests": s["mpc_requests"],
        "auto_reloads": s["auto_reloads"],
        "shed_requests": s["shed_requests"],
        "expired_requests": s["expired_requests"],
        "mean_dispatch_batch": round(s["requests"] / d, 2),
        "pad_fraction": round(
            s["padded_slots"] / max(s["requests"] + s["padded_slots"], 1),
            3),
        "since_first_dispatch_s": (round(time.time() - s["started_at"], 1)
                                   if s["started_at"] else 0.0),
    }

class BestWatcher:
    """Auto-reload: watch a best-checkpoint marker and hot-load weights.

    The `reload` protocol line already lets a CLIENT trigger a
    zero-downtime weight swap; this completes the ops loop SERVER-side —
    a training run writing ``<workdir>/best`` continuously feeds a live
    server with no client involvement (`serve --watch-best`).  A daemon
    thread polls the marker file's (mtime, size) every ``poll_s``
    seconds; on change it calls ``reload_fn`` (the same loader the
    protocol reload uses), publishes the new state under a version
    counter, and notifies registered callbacks (the cross-batch
    dispatcher).  Serving loops apply the swap at burst boundaries —
    the same segment semantics as a protocol reload — and same pytree
    shapes mean the per-bucket compiled programs are reused (zero
    recompiles).  Swaps are counted in the ``stats`` line
    (``auto_reloads``).
    """

    def __init__(self, reload_fn, marker_path: str, poll_s: float = 2.0):
        self._reload = reload_fn
        self._marker = marker_path
        self._poll = poll_s
        self._lock = threading.Lock()
        self._state = None
        self._version = 0
        self._callbacks: list = []
        self._stop = threading.Event()
        self._last_sig = self._sig()
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="best-watcher")
        self._thread.start()

    def _sig(self):
        try:
            st = os.stat(self._marker)
            return (st.st_mtime_ns, st.st_size)
        except OSError:
            return None

    def current(self):
        """(version, latest state or None) — consumers remember the
        version they applied and re-read when it moves."""
        with self._lock:
            return self._version, self._state

    def on_swap(self, fn) -> None:
        """Register a callback invoked with each newly loaded state."""
        with self._lock:
            self._callbacks.append(fn)

    def check_now(self) -> bool:
        """One synchronous poll+load cycle (the thread's body; public
        for deterministic tests).  Returns True if a swap happened."""
        sig = self._sig()
        if sig is None or sig == self._last_sig:
            return False
        try:
            new_state = self._reload()
        except Exception:  # noqa: BLE001 — keep watching; try next poll
            return False  # _last_sig NOT advanced: the next poll retries
        if new_state is None:
            return False  # ditto — a transient restore failure (e.g. a
            # TPU-tunnel hiccup mid-save) must not permanently skip this
            # best checkpoint.
        self._last_sig = sig
        with self._lock:
            self._state = new_state
            self._version += 1
            callbacks = list(self._callbacks)
        for fn in callbacks:
            fn(new_state)
        with _STATS_LOCK:
            SERVING_STATS["auto_reloads"] += 1
        return True

    def _run(self) -> None:
        while not self._stop.wait(self._poll):
            self.check_now()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=10)


# Closed-loop serving parameters are FIXED (not per-request): each
# distinct (total_steps, replan_every, n_candidates) combination is a
# separate compiled program at 90-300 s per remote compile, so honoring
# per-request overrides would be a latency landmine.  Clients needing
# other settings run `plan --mpc` with flags.
MPC_TOTAL_STEPS = 64
MPC_REPLAN_EVERY = 8
MPC_CANDIDATES = 256


def _condition_for(cfg: Config, scene: Scene) -> jnp.ndarray:
    if cfg.conditioning == "image":
        return rasterize_scene(scene, size=cfg.image_size)
    if cfg.conditioning == "startgoal":
        return jnp.concatenate([scene.start, scene.goal])
    return jnp.zeros((0,), jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _conditions_for_batch(cfg: Config, scene_b: Scene) -> jnp.ndarray:
    """Conditions for a STACKED scene pytree in one dispatch — a
    per-scene eager loop would pay the ~35 ms tunnel round-trip per
    scene (image rasterisation dominated a 16-burst before this).
    (The serving loop no longer uses this — condition building is fused
    into the per-bucket programs below; `cli.py eval --dataset` still
    does.)"""
    return jax.vmap(lambda s: _condition_for(cfg, s))(scene_b)


@functools.partial(jax.jit, static_argnames=("cfg", "n_diverse", "refine"))
def _serve_plan_program(cfg: Config, state: TrainState, scene_b: Scene,
                        keys: jax.Array, n_diverse: int, refine: str):
    """The per-bucket serving program: condition building (image
    rasterisation / startgoal concat) FUSED into the planning program,
    so a chunk costs ONE dispatch instead of two — on the ~35 ms-per-
    dispatch TPU tunnel the separate conditions program was half the
    single-request latency (round 3).  plan_batch / the refine variants
    inline here (jit-in-jit composes into one XLA program)."""
    cond_b = jax.vmap(lambda s: _condition_for(cfg, s))(scene_b)
    if refine == "cem":
        from ndivplanning_tpu.planning.cem import plan_cem_batch

        result, _ = plan_cem_batch(cfg, state, scene_b, cond_b, keys,
                                   n_diverse=n_diverse)
    elif refine == "grad":
        from ndivplanning_tpu.planning.grad_refine import plan_grad_batch

        result, _ = plan_grad_batch(cfg, state, scene_b, cond_b, keys,
                                    n_diverse=n_diverse)
    elif refine == "trajopt":
        from ndivplanning_tpu.planning.trajopt import plan_trajopt_batch

        result, _ = plan_trajopt_batch(cfg, state, scene_b, cond_b, keys,
                                       n_diverse=n_diverse)
    elif refine == "ilqr":
        from ndivplanning_tpu.planning.ilqr import plan_ilqr_batch

        result, _ = plan_ilqr_batch(cfg, state, scene_b, cond_b, keys,
                                    n_diverse=n_diverse)
    elif refine == "cem+trajopt":
        from ndivplanning_tpu.planning.trajopt import plan_cem_trajopt_batch

        result, _ = plan_cem_trajopt_batch(cfg, state, scene_b, cond_b,
                                           keys, n_diverse=n_diverse)
    else:
        result = plan_batch(cfg, state, scene_b, cond_b, keys,
                            n_diverse=n_diverse)
    return result


@functools.partial(jax.jit, static_argnames=(
    "cfg", "total_steps", "replan_every", "n_candidates"))
def _serve_mpc_program(cfg: Config, state: TrainState, scene_b: Scene,
                       keys: jax.Array, total_steps: int,
                       replan_every: int, n_candidates: int):
    """Closed-loop serving program, conditions fused (see
    :func:`_serve_plan_program`)."""
    from ndivplanning_tpu.planning.mpc import mpc_rollout_batch

    cond_b = jax.vmap(lambda s: _condition_for(cfg, s))(scene_b)
    return mpc_rollout_batch(cfg, state, scene_b, cond_b, keys,
                             total_steps=total_steps,
                             replan_every=replan_every,
                             n_candidates=n_candidates)


def _bucket_for(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return BUCKETS[-1]


def handle_batch(cfg: Config, state: TrainState, requests: list,
                 key: jax.Array, n_diverse: int = 4,
                 refine: str = "none",
                 arrivals: list[float] | None = None,
                 on_progress=None, out: list | None = None) -> list[dict]:
    """Plan for a list of scene requests in bucketed ``plan_batch``
    dispatches; returns one JSON-serialisable response per request.

    ``refine`` routes the dispatch through a latent-refinement planner
    ("cem" | "grad" | "trajopt" — planning/{cem,grad_refine,trajopt}.py) instead
    of one-shot sampling — still one program per bucket size.

    ``arrivals`` (optional, ``time.perf_counter()`` per request) makes
    ``latency_ms`` the PER-REQUEST queue+service time — arrival to
    response-ready — instead of the shared per-dispatch time (round-2
    verdict weak #7: a request queued behind earlier chunks of a big
    burst must show its true latency, not its chunk's dispatch time).

    ``on_progress`` (optional, zero-arg) is invoked after every dispatch
    chunk has filled its slice of the response list (and once after the
    parse-error pass): the serve loop uses it to WRITE already-answered
    responses before later work — without it, one MPC episode at the
    tail of a mixed burst would hold every finished plan response in
    memory until the episode ends (round-3 review).

    ``out`` (optional) is the response list to fill IN PLACE (length
    ``len(requests)``, all None) so an ``on_progress`` caller can see
    partial results; also returned.

    A malformed request yields an ``{"error": ...}`` entry at its
    position; the rest of the batch still plans.
    """
    t_in = time.perf_counter()
    if arrivals is None:
        arrivals = [t_in] * len(requests)
    if out is None:
        out = [None] * len(requests)
    assert len(out) == len(requests)
    responses: list[dict | None] = out
    scenes: list[Scene] = []
    idx: list[int] = []
    mpc_scenes: list[Scene] = []
    mpc_idx: list[int] = []
    for i, req in enumerate(requests):
        try:
            scene = Scene.create(req["start"], req["goal"],
                                 req.get("obstacles"))
            if req.get("mpc"):
                mpc_scenes.append(scene)
                mpc_idx.append(i)
            else:
                scenes.append(scene)
                idx.append(i)
        except Exception as e:  # noqa: BLE001 — isolated per request
            responses[i] = {"error": f"{type(e).__name__}: {e}"}
    if on_progress is not None:
        on_progress()  # error-only prefixes can flush before any compute

    def dispatch_plan(scene_b, keys, bucket, chunk_idx):
        _record_dispatch(len(chunk_idx), bucket, mpc=False)
        result = _serve_plan_program(cfg, state, scene_b, keys,
                                     n_diverse, refine)
        # ONE host transfer for the whole dispatch: the diverse set was
        # gathered on device, so the [B, N, H, S] candidate tensor never
        # crosses the tunnel (each separate fetch costs ~35 ms there).
        best_traj, best_score, best_reached, diverse = jax.device_get(
            (result.best_traj, result.best_score, result.best_reached,
             result.diverse_trajs))
        t_done = time.perf_counter()

        for j, i in enumerate(chunk_idx):
            responses[i] = {
                "best_traj": np.asarray(best_traj[j]).tolist(),
                "best_score": float(best_score[j]),
                "best_reached": float(best_reached[j]),
                "diverse_trajs": np.asarray(diverse[j]).tolist(),
                "latency_ms": round((t_done - arrivals[i]) * 1e3, 2),
                "batch_size": bucket,
            }
        if on_progress is not None:
            on_progress()

    # Cheap open-loop plans dispatch BEFORE any closed-loop episodes: one
    # MPC request in a mixed burst must not add a full 64-step episode to
    # the head-of-line latency of every ordinary request — and
    # ``on_progress`` lets the caller WRITE those plan responses (in
    # protocol order) before the episodes run.
    key, k_plan, k_mpc = jax.random.split(key, 3)
    _dispatch_buckets(cfg, scenes, idx, k_plan, dispatch_plan)
    if mpc_scenes:
        _handle_mpc(cfg, state, mpc_scenes, mpc_idx, responses, k_mpc,
                    arrivals, on_progress=on_progress)
    return responses  # every index was filled (planned or error)


def _dispatch_buckets(cfg: Config, scenes: list[Scene], idx: list[int],
                      key: jax.Array, dispatch) -> None:
    """The shared serving dispatch frame (plan AND MPC requests): chunk
    ``scenes`` into max-bucket groups, pad each chunk to its bucket size
    with copies of the first scene (padded outputs are dropped by the
    ``chunk_idx`` loop), build the stacked scene pytree, and call
    ``dispatch(scene_b, keys, bucket, chunk_idx)`` per chunk (condition
    building happens INSIDE the dispatch's fused program)."""
    pos = 0
    max_bucket = BUCKETS[-1]
    while pos < len(scenes):
        chunk = scenes[pos:pos + max_bucket]
        chunk_idx = idx[pos:pos + max_bucket]
        pos += len(chunk)
        bucket = _bucket_for(len(chunk))
        padded = chunk + [chunk[0]] * (bucket - len(chunk))
        scene_b = jax.tree.map(lambda *xs: jnp.stack(xs), *padded)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, bucket)
        dispatch(scene_b, keys, bucket, chunk_idx)


def handle_request(cfg: Config, state: TrainState, request: dict,
                   key: jax.Array, n_diverse: int = 4) -> dict:
    """Plan for one scene request (bucket-1 batch dispatch)."""
    return handle_batch(cfg, state, [request], key, n_diverse=n_diverse)[0]


def _handle_mpc(cfg: Config, state: TrainState, scenes: list[Scene],
                idx: list[int], responses: list, key: jax.Array,
                arrivals: list[float], on_progress=None) -> None:
    """Closed-loop (``"mpc": true``) requests: bucketed
    ``mpc_rollout_batch`` dispatches, responses filled in place.
    ``arrivals`` is indexed by the ORIGINAL request position (``idx``
    values), so ``latency_ms`` is per-request queue+service time.

    Response: {"path": [[x, y] * MPC_TOTAL_STEPS], "reached": 0|1,
    "collided": 0|1, "n_replans": n, "latency_ms": t, "batch_size": b}.
    """
    def dispatch_mpc(scene_b, keys, bucket, chunk_idx):
        _record_dispatch(len(chunk_idx), bucket, mpc=True)
        result = _serve_mpc_program(cfg, state, scene_b, keys,
                                    MPC_TOTAL_STEPS, MPC_REPLAN_EVERY,
                                    MPC_CANDIDATES)
        path, reached, collided = jax.device_get(
            (result.positions, result.reached, result.collided))
        t_done = time.perf_counter()

        for j, i in enumerate(chunk_idx):
            responses[i] = {
                "path": np.asarray(path[j]).tolist(),
                "reached": float(reached[j]),
                "collided": float(collided[j]),
                "n_replans": int(result.n_replans),
                "latency_ms": round((t_done - arrivals[i]) * 1e3, 2),
                "batch_size": bucket,
            }
        if on_progress is not None:
            on_progress()

    _dispatch_buckets(cfg, scenes, idx, key, dispatch_mpc)


class _LineSource:
    """Line reader with an honest non-blocking drain.

    For real file descriptors we read the RAW fd ourselves (select +
    os.read into our own buffer): checking ``select`` while using the
    TextIOWrapper's ``readline`` misses lines the wrapper has already
    buffered — a 16-line burst written in one ``write()`` would be
    pulled into the wrapper's buffer by the first ``readline`` and the
    kernel buffer would look empty, so coalescing would silently never
    engage on the exact production path it was built for.  Streams
    without a usable fd (StringIO tests) fall back to ``readline``,
    which never blocks there.
    """

    def __init__(self, stdin: IO[str]):
        self._stdin = stdin
        self._buf = b""
        self._eof = False
        try:
            self._fd: int | None = stdin.fileno()
        except (AttributeError, OSError, ValueError,
                io.UnsupportedOperation):
            self._fd = None

    def _pop_line(self) -> str | None:
        i = self._buf.find(b"\n")
        if i < 0:
            if self._eof and self._buf:
                line, self._buf = self._buf, b""
                return line.decode("utf-8", errors="replace")
            return None
        line, self._buf = self._buf[:i + 1], self._buf[i + 1:]
        return line.decode("utf-8", errors="replace")

    def _fill(self, block: bool) -> bool:
        """Read once from the fd into the buffer; returns False when no
        data was (or will be) available."""
        if self._eof:
            return False
        if not block:
            ready, _, _ = select.select([self._fd], [], [], 0)
            if not ready:
                return False
        chunk = os.read(self._fd, 65536)
        if chunk == b"":
            self._eof = True
            return False
        self._buf += chunk
        return True

    def readline(self) -> str:
        """Next line, blocking; '' at EOF (matching io semantics)."""
        if self._fd is None:
            return self._stdin.readline()
        while True:
            line = self._pop_line()
            if line is not None:
                return line
            if self._eof:
                return ""
            self._fill(block=True)

    def drain(self, max_n: int) -> list[str]:
        """Up to ``max_n`` immediately-available lines, never blocking."""
        out: list[str] = []
        if self._fd is None:
            while len(out) < max_n:
                line = self._stdin.readline()
                if line == "":
                    break
                out.append(line)
            return out
        while len(out) < max_n:
            line = self._pop_line()
            if line is not None:
                out.append(line)
                continue
            if not self._fill(block=False):
                break
        return out


def warmup(cfg: Config, state: TrainState, n_diverse: int = 4,
           refine: str = "none", buckets=BUCKETS,
           mpc: bool = False) -> float:
    """Pre-compile every bucket's serving programs; returns elapsed
    seconds.

    On a remote-compile TPU each distinct program costs 90-300 s to
    build; without warmup the FIRST request of each bucket size pays
    that latency live, which no production deployment can accept.  Runs
    one dummy batch per bucket through :func:`handle_batch` (responses
    discarded) so the condition-building and plan/refine programs for
    all of ``buckets`` are in the jit cache before traffic arrives.
    """
    key = jax.random.PRNGKey(0)
    dummy = {"start": [0.1, 0.1], "goal": [0.9, 0.9],
             "obstacles": [[0.5, 0.5, 0.1]]}
    t0 = time.perf_counter()
    for b in buckets:
        handle_batch(cfg, state, [dict(dummy) for _ in range(b)], key,
                     n_diverse=n_diverse, refine=refine)
        if mpc:
            handle_batch(cfg, state,
                         [dict(dummy, mpc=True) for _ in range(b)], key,
                         n_diverse=n_diverse, refine=refine)
    return time.perf_counter() - t0


class _ResponseWriter:
    """Response encode/write pipeline for :func:`serve`.

    With ``overlap=True`` a daemon thread pops finished response units
    off a queue and does the ``json.dumps`` + write there, so encoding
    batch N's responses (diverse_trajs lists are the bulk of the bytes)
    overlaps with reading and DISPATCHING batch N+1 on the main thread —
    the round-2 verdict's serving-concurrency item.  Ordering is
    preserved (single queue, single writer thread).  ``overlap=False``
    keeps the old synchronous write (deterministic interleaving for
    tests/debugging).  An encode/write error is re-raised on the main
    thread at the next push or close.
    """

    def __init__(self, stdout: IO[str], overlap: bool):
        self._stdout = stdout
        self._q: "queue.Queue[object]" = queue.Queue(maxsize=4)
        self._thread = None
        self._error: BaseException | None = None
        if overlap:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def _write_one(self, response: object) -> None:
        self._stdout.write(json.dumps(response) + "\n")
        self._stdout.flush()

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is _WRITER_DONE:
                return
            try:
                self._write_one(item)
            except BaseException as e:  # noqa: BLE001
                self._error = e
                return

    def _check(self) -> None:
        if self._error is not None:
            # The consumer thread is dead: fall back to synchronous
            # writes so later push() calls can't block on a full queue
            # with nobody draining it, then surface the error once.
            self._thread = None
            err, self._error = self._error, None
            raise err

    def push(self, response: object) -> None:
        self._check()
        if self._thread is None:
            self._write_one(response)
        else:
            self._q.put(response)

    def close(self, timeout: float | None = None) -> None:
        """Flush and stop the writer thread; surfaces any pending write
        error.  Never hangs on a DEAD thread: the bounded put is retried
        only while the thread is alive (a thread that died with the
        queue full would otherwise block this forever — round-3 review).
        A live thread wedged on a backpressured pipe blocks only up to
        ``timeout`` (None = wait indefinitely: legitimate backpressure
        drains once the client reads)."""
        t = self._thread
        if t is not None:
            deadline = (None if timeout is None
                        else time.perf_counter() + timeout)
            while t.is_alive():
                try:
                    self._q.put(_WRITER_DONE, timeout=0.1)
                    break
                except queue.Full:
                    if (deadline is not None
                            and time.perf_counter() >= deadline):
                        break
            t.join(timeout)
            self._thread = None
        self._check()


_WRITER_DONE = object()


class _Pending:
    """One request in flight through the :class:`_CrossBatcher`."""

    __slots__ = ("req", "arrival", "event", "result")

    def __init__(self, req: dict, arrival: float):
        self.req = req
        self.arrival = arrival
        self.event = threading.Event()
        self.result: dict | list | None = None


class _CrossBatcher:
    """Cross-connection dynamic batching for :func:`serve_tcp`.

    Without it, N concurrent single-request clients cost N serial
    bucket-1 dispatches (JAX serialises device dispatch; on the ~35 ms-
    per-dispatch TPU tunnel that caps aggregate throughput at ~1/35 ms
    regardless of client count).  The batcher funnels every
    connection's requests through ONE dispatcher thread that drains
    whatever is pending — across connections — into shared
    ``handle_batch`` dispatches: while dispatch N runs, new arrivals
    accumulate and ride dispatch N+1 together (continuous batching; no
    artificial delay is ever added to an idle server).

    Responses complete per-request via ``handle_batch``'s
    ``on_progress`` hook, so one client's closed-loop MPC episode never
    holds another client's finished plan response hostage.  The
    dispatcher owns the PRNG stream (per-connection seeds don't apply
    in this mode — requests from many clients share dispatch draws).
    """

    def __init__(self, cfg: Config, state: TrainState, *,
                 n_diverse: int = 4, refine: str = "none", seed: int = 0,
                 max_batch: int = BUCKETS[-1],
                 max_pending: int | None = None,
                 deadline_ms: float | None = None):
        self._cfg = cfg
        self._state = state
        self._n_diverse = n_diverse
        self._refine = refine
        self._key = jax.random.PRNGKey(seed)
        self._max = max_batch
        # Admission control (round-4): ``max_pending`` bounds the number
        # of ADMITTED requests waiting or in flight — past it, new
        # requests are refused at the door with {"error": "overloaded",
        # "retry_ms": ...} instead of growing an unbounded queue whose
        # tail latency grows without bound.  ``deadline_ms`` bounds how
        # long an admitted request may QUEUE: at dispatch time anything
        # older is answered {"error": "deadline_exceeded"} rather than
        # served a stale answer late.  None disables either knob.
        self._max_pending = max_pending
        self._deadline_s = (None if not deadline_ms
                            else float(deadline_ms) / 1000.0)
        self._pending_n = 0
        self._pending_lock = threading.Lock()
        # Per-dispatch service-time EMA seeds the shed response's
        # retry_ms hint (~when the present queue will have drained).
        self._ema_dispatch_s = 0.05
        self._q: "queue.Queue[list[_Pending] | None]" = queue.Queue()
        self._closed = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _retry_ms_hint(self) -> int:
        with self._pending_lock:
            n = self._pending_n
        dispatches_ahead = max(-(-n // self._max), 1)
        return max(int(dispatches_ahead * self._ema_dispatch_s * 1000), 1)

    def submit(self, reqs: list[dict], arrival: float) -> list[_Pending]:
        """Enqueue one connection's burst (atomically — it can coalesce
        with other connections' bursts but never splits mid-line).
        After ``close()`` every submit fails fast instead of enqueueing
        into a queue nobody drains (a connection thread would otherwise
        block forever on its event)."""
        pendings = [_Pending(r, arrival) for r in reqs]
        if not pendings:
            return pendings
        if self._closed:
            self._fail(pendings, "server shutting down", counted=False)
            return pendings
        with self._pending_lock:
            # An oversized burst at an IDLE dispatcher is admitted even
            # past max_pending: the dispatcher bucket-splits internally,
            # and refusing it would make a plan_batch larger than the
            # budget unservable forever (its retry hint could never come
            # true).  The cap guards queue GROWTH, so it only applies
            # once something is already pending.
            over = (self._max_pending is not None
                    and self._pending_n > 0
                    and self._pending_n + len(pendings) > self._max_pending)
            if not over:
                self._pending_n += len(pendings)
        if over:
            # Load shed: refuse the whole burst atomically (a burst is a
            # client-level unit; admitting half would interleave partial
            # answers with refusals on one line).  The pendings were
            # never counted, so complete them directly.
            retry = self._retry_ms_hint()
            _record_load_control(shed=len(pendings))
            for p in pendings:
                p.result = {"error": "overloaded", "retry_ms": retry}
                p.event.set()
            return pendings
        self._q.put(pendings)
        if self._closed and not self._thread.is_alive():
            # close() raced our put and the dispatcher already exited:
            # drain-fail whatever is left ourselves.
            while True:
                try:
                    rest = self._q.get_nowait()
                except queue.Empty:
                    break
                if rest is not None:
                    self._fail(rest, "server shutting down")
        return pendings

    def set_state(self, state: TrainState) -> None:
        """Hot-swap the served weights (the `reload` protocol line).
        A plain reference swap: dispatches already in flight finish on
        the old state; the next dispatch reads the new one.  Same
        pytree shapes -> the per-bucket compiled programs are reused,
        zero recompiles."""
        self._state = state

    def close(self) -> None:
        self._closed = True
        self._q.put(None)
        self._thread.join(timeout=30)

    def _complete(self, p: _Pending, result) -> None:
        """Finish one ADMITTED pending: set its result exactly once and
        release its admission slot (the ``max_pending`` budget counts
        queued + in-flight requests, so every completion path must come
        through here or the budget leaks).

        The completed-check and the decrement happen atomically under
        ``_pending_lock``: today every completion path runs on the
        dispatcher thread, but a check-then-act outside the lock would
        turn any future concurrent completer into a double-decrement
        that silently inflates the effective max_pending (ADVICE r4)."""
        with self._pending_lock:
            if p.event.is_set():
                return
            if p.result is None:
                p.result = result
            self._pending_n -= 1
            p.event.set()

    def _fail(self, pendings: list[_Pending], msg: str,
              counted: bool = True) -> None:
        for p in pendings:
            if counted:
                self._complete(p, {"error": msg})
            else:  # refused before admission — no slot to release
                if p.result is None:
                    p.result = {"error": msg}
                p.event.set()

    def _run(self) -> None:
        while True:
            first = self._q.get()
            if first is None:
                # Shutdown: fail anything still queued so no connection
                # thread blocks forever on an abandoned event.
                while True:
                    try:
                        rest = self._q.get_nowait()
                    except queue.Empty:
                        return
                    if rest is not None:
                        self._fail(rest, "server shutting down")
            batch = list(first)
            while len(batch) < self._max:
                try:
                    more = self._q.get_nowait()
                except queue.Empty:
                    break
                if more is None:
                    self._q.put(None)  # re-post: exit after this batch
                    break
                batch.extend(more)
            if self._deadline_s is not None:
                # Queueing deadline: an admitted request that waited past
                # its deadline gets an explicit late-drop error instead
                # of an answer it stopped waiting for — this is what
                # bounds tail latency for everything actually SERVED.
                now = time.perf_counter()
                live = []
                n_expired = 0
                for p in batch:
                    waited = now - p.arrival
                    if waited > self._deadline_s:
                        n_expired += 1
                        self._complete(p, {
                            "error": "deadline_exceeded",
                            "waited_ms": round(waited * 1000.0, 1),
                            "deadline_ms": round(self._deadline_s * 1000.0,
                                                 1)})
                    else:
                        live.append(p)
                if n_expired:
                    _record_load_control(expired=n_expired)
                batch = live
            if batch:
                self._dispatch(batch)

    def _dispatch(self, batch: list[_Pending]) -> None:
        out: list = [None] * len(batch)
        done = [False] * len(batch)

        def progress() -> None:
            for i, p in enumerate(batch):
                if not done[i] and out[i] is not None:
                    done[i] = True
                    self._complete(p, out[i])

        t0 = time.perf_counter()
        try:
            # The key split lives INSIDE the try: any failure here must
            # fail this batch's pendings, not kill the dispatcher loop
            # with waiters left blocked.
            self._key, sub = jax.random.split(self._key)
            handle_batch(self._cfg, self._state,
                         [p.req for p in batch], sub,
                         n_diverse=self._n_diverse, refine=self._refine,
                         arrivals=[p.arrival for p in batch],
                         on_progress=progress, out=out)
            progress()
            self._ema_dispatch_s = (0.7 * self._ema_dispatch_s
                                    + 0.3 * (time.perf_counter() - t0))
        except BaseException as e:  # noqa: BLE001 — keep serving
            for i, p in enumerate(batch):
                if not done[i]:
                    done[i] = True
                    self._complete(p, out[i] if out[i] is not None else
                                   {"error": f"{type(e).__name__}: {e}"})


def serve(cfg: Config, state: TrainState, stdin: IO[str] = sys.stdin,
          stdout: IO[str] = sys.stdout, seed: int = 0,
          max_coalesce: int = BUCKETS[-1], refine: str = "none",
          overlap: bool = True, batcher: _CrossBatcher | None = None,
          reload_fn=None, watcher: BestWatcher | None = None) -> int:
    """Blocking request loop; returns number of request lines answered.

    Each input line is either one request object or an array of request
    objects (answered with an array, planned as one batch).  Bursts of
    pending lines additionally coalesce into shared dispatches.
    ``refine`` ("cem" | "grad" | "trajopt") serves refined plans instead of
    one-shot samples.  Call :func:`warmup` first to pre-compile all
    bucket programs (the CLI's ``--warmup``).  ``overlap`` pipelines the
    JSON encode/write of batch N with the dispatch of batch N+1 on a
    writer thread (:class:`_ResponseWriter`); disable for strictly
    synchronous operation.
    """
    key = jax.random.PRNGKey(seed)
    source = _LineSource(stdin)
    writer = _ResponseWriter(stdout, overlap)
    try:
        n = _serve_loop(cfg, state, source, writer, key, max_coalesce,
                        refine, batcher=batcher, reload_fn=reload_fn,
                        watcher=watcher)
    except BaseException:
        # Flush/stop the writer without letting a secondary write error
        # (dead client pipe) mask the loop's own exception; bounded wait
        # so a wedged pipe cannot turn the exception path into a hang
        # (the daemon thread is abandoned past the deadline).
        try:
            writer.close(timeout=5.0)
        except Exception:  # noqa: BLE001
            pass
        raise
    writer.close()  # clean path: surface any pending write error
    return n


def serve_tcp(cfg: Config, state: TrainState, host: str = "127.0.0.1",
              port: int = 0, seed: int = 0, refine: str = "none",
              overlap: bool = True, max_coalesce: int = BUCKETS[-1],
              cross_batch: bool = False, reload_fn=None,
              watcher: BestWatcher | None = None,
              max_pending: int | None = None,
              deadline_ms: float | None = None):
    """Network serving: the same JSON-lines protocol over TCP.

    Returns a ``ThreadingTCPServer`` already bound (``port=0`` picks an
    ephemeral port — read ``server.server_address``) but not yet
    serving; the caller runs ``serve_forever()`` (the CLI does) or runs
    it on a thread and calls ``shutdown()`` (tests do).

    Each connection runs the SAME loop as stdin serving — per-connection
    burst coalescing included, since :class:`_LineSource` reads raw fds
    with ``select`` and a socket fd supports both — against the shared
    ``state`` and jit cache, so every connection reuses the same
    per-bucket compiled programs (compile once, serve many clients).
    By default concurrent connections interleave at dispatch
    granularity: JAX serialises device dispatches, so cross-client
    batches never mix and each connection derives its own PRNG stream
    (``seed`` + connection counter).  With ``cross_batch=True`` a shared
    :class:`_CrossBatcher` additionally coalesces requests ACROSS
    connections into shared dispatches — N concurrent single-request
    clients then cost ~1 dispatch instead of N serial bucket-1
    dispatches (the PRNG stream is dispatcher-owned in this mode).
    A ``quit`` line (or EOF) closes only that connection.
    """
    import itertools
    import socketserver

    conn_counter = itertools.count()
    batcher = (_CrossBatcher(cfg, state, refine=refine, seed=seed,
                             max_pending=max_pending,
                             deadline_ms=deadline_ms)
               if cross_batch else None)
    if watcher is not None and batcher is not None:
        watcher.on_swap(batcher.set_state)

    class _Handler(socketserver.StreamRequestHandler):
        def handle(self):
            conn_id = next(conn_counter)
            server._handler_threads.add(threading.current_thread())
            # Text views over the socket: _LineSource wants .fileno()
            # (raw-fd select/read), the writer wants .write/.flush.
            reader = self.connection.makefile("r", encoding="utf-8")
            writer = self.connection.makefile("w", encoding="utf-8")
            try:
                n = serve(cfg, state, stdin=reader, stdout=writer,
                          seed=seed + conn_id, refine=refine,
                          overlap=overlap, max_coalesce=max_coalesce,
                          batcher=batcher, reload_fn=reload_fn,
                          watcher=watcher)
                with server._lock:
                    server.lines_served += n
            except (BrokenPipeError, ConnectionResetError):
                pass  # client went away mid-response; nothing to answer
            finally:
                for f in (reader, writer):
                    try:
                        f.close()
                    except Exception:  # noqa: BLE001
                        pass
                server._handler_threads.discard(threading.current_thread())

    class _Server(socketserver.ThreadingTCPServer):
        # Daemon handlers: a hung client must never block process exit.
        allow_reuse_address = True
        daemon_threads = True

        def server_close(self):
            super().server_close()
            # ThreadingMixIn only joins NON-daemon handler threads, so
            # an in-flight connection's lines_served increment would
            # race whoever reads the total after close (the CLI's final
            # {"served": N} line).  Give live handlers a bounded window
            # to finish; a handler stuck on a dead client stays daemon
            # and is abandoned after the timeout.  getattr: socketserver
            # calls server_close() from __init__ on a bind failure,
            # BEFORE the post-construction attributes exist — the real
            # error (e.g. EADDRINUSE) must surface, not an
            # AttributeError from this cleanup.
            for t in list(getattr(self, "_handler_threads", ())):
                if t is not threading.current_thread():
                    t.join(timeout=2.0)
            if batcher is not None:
                batcher.close()

    try:
        server = _Server((host, port), _Handler)
    except BaseException:
        if batcher is not None:
            batcher.close()  # don't leak the dispatcher thread
        raise
    server.lines_served = 0
    server._lock = threading.Lock()
    server._handler_threads = set()
    return server


def _serve_loop(cfg: Config, state: TrainState, source: _LineSource,
                writer: _ResponseWriter, key: jax.Array,
                max_coalesce: int, refine: str,
                batcher: _CrossBatcher | None = None,
                reload_fn=None, watcher: BestWatcher | None = None) -> int:
    n = 0
    stop = False
    # Auto-reload: start from the watcher's latest state (a connection
    # opened after a swap must not serve the stale boot weights) and
    # re-check at every burst boundary below.
    watch_ver = -1
    if watcher is not None:
        watch_ver, w_state = watcher.current()
        if w_state is not None:
            state = w_state

    def process_segment(seg_lines: list[str], t_arrive: float) -> None:
        """Parse + dispatch + flush one reload-free run of burst lines
        (the pre-reload serving semantics, unchanged)."""
        nonlocal n, key, stop
        # units: per answered line, (kind, payload, start, count) —
        # [start, start+count) is the line's slice of the flat request
        # list (count 0 for parse errors, which carry their payload).
        units: list[tuple[str, object, int, int]] = []
        flat: list[dict] = []
        for raw in seg_lines:
            if raw == "stats":
                # Observability probe: answered from the process-level
                # counters (includes warmup dispatches), no device work.
                # Snapshot at WRITE time, in protocol order — a stats
                # line after requests in the same burst sees their
                # dispatches.
                units.append(("info", None, len(flat), 0))
                continue
            if raw == "quit":
                # Keep processing the rest of the burst: these lines
                # were already consumed from the pipe, so skipping them
                # would leave their clients waiting forever for the
                # one-response-per-line contract to be honoured.
                stop = True
                continue
            try:
                parsed = json.loads(raw)
            except Exception as e:  # noqa: BLE001
                units.append(("error",
                              {"error": f"{type(e).__name__}: {e}"},
                              len(flat), 0))
                continue
            if isinstance(parsed, list):
                units.append(("list", None, len(flat), len(parsed)))
                flat.extend(parsed)
            else:
                units.append(("single", None, len(flat), 1))
                flat.append(parsed)

        # Responses are written IN LINE ORDER as soon as they (and every
        # earlier line's) are ready — handle_batch's on_progress fires
        # after each dispatch, so finished plan responses go out before
        # a later line's MPC episode runs instead of buffering behind
        # it.  latency_ms is restamped at write-enqueue: arrival ->
        # handed to the writer in protocol order, which INCLUDES any
        # in-order wait behind an earlier line still computing — the
        # client-observable number (round-3 review; a response cannot
        # reach the client before the protocol lets us write it).
        answers: list = [None] * len(flat)
        next_unit = 0

        def flush_ready():
            nonlocal n, next_unit
            while next_unit < len(units):
                kind, payload, start, count = units[next_unit]
                chunk = answers[start:start + count]
                if any(r is None for r in chunk):
                    return
                t_now = time.perf_counter()
                for r in chunk:
                    if "latency_ms" in r:
                        r["latency_ms"] = round((t_now - t_arrive) * 1e3, 2)
                response = (serving_stats() if kind == "info"
                            else payload if kind == "error"
                            else chunk if kind == "list" else chunk[0])
                writer.push(response)
                n += 1
                next_unit += 1

        if flat:
            if batcher is not None:
                # Cross-connection mode: the shared dispatcher plans this
                # burst (possibly riding a dispatch with other clients'
                # requests).  Waiting in protocol order is free — only
                # protocol-ordered units can flush anyway.
                for i, p in enumerate(batcher.submit(flat, t_arrive)):
                    p.event.wait()
                    answers[i] = p.result
                    flush_ready()
            else:
                key, sub = jax.random.split(key)
                handle_batch(cfg, state, flat, sub, refine=refine,
                             arrivals=[t_arrive] * len(flat),
                             on_progress=flush_ready, out=answers)
        flush_ready()  # error-only bursts + anything not yet flushed

    while not stop:
        first = source.readline()
        if first == "":
            break
        if watcher is not None:
            ver, w_state = watcher.current()
            if ver != watch_ver:
                watch_ver = ver
                if w_state is not None:
                    state = w_state
        lines = [first]
        lines += source.drain(max_coalesce - 1)
        # One arrival stamp for the whole burst: every line was already
        # sitting in the pipe when we woke, so "now" is the earliest
        # honest arrival we can observe.  Requests in later chunks of
        # the burst then show queue time behind earlier dispatches.
        t_arrive = time.perf_counter()
        # A `reload` line is a SEGMENT BOUNDARY: everything before it in
        # the burst is dispatched on the old weights first, then the
        # swap happens, then the rest of the burst runs on the new ones
        # — "reload applies to requests after it", exactly the pipelined
        # client's reading.  Same pytree shapes, so the per-bucket
        # compiled programs are reused (zero recompiles; a train loop
        # writing <workdir>/best can feed a live server).
        segment: list[str] = []
        for raw in lines:
            raw = raw.strip()
            if not raw:
                continue
            if raw != "reload":
                segment.append(raw)
                continue
            process_segment(segment, t_arrive)
            segment = []
            if reload_fn is None:
                payload = {"error": "reload unavailable: server was "
                                    "started without a checkpoint "
                                    "source"}
            else:
                new_state = reload_fn()
                if new_state is None:
                    payload = {"error": "reload failed: no checkpoint "
                                        "found"}
                else:
                    state = new_state
                    if batcher is not None:
                        batcher.set_state(new_state)
                    payload = {"reloaded": True,
                               "step": int(new_state.step)}
            writer.push(payload)
            n += 1
        process_segment(segment, t_arrive)
    return n
