"""Programmatic client for the planning server's JSON-lines protocol.

The server (`planning/server.py`) answers one JSON line per request line
over any line transport — stdin/stdout of a `cli serve` process, or a
TCP connection to `cli serve --tcp PORT`.  This module is the client
half: it owns the transport, frames the protocol, and maps error
replies to exceptions, so callers never hand-roll socket/pipe code:

    with PlanningClient.tcp("127.0.0.1", 7421) as c:
        resp = c.plan(start=[0.1, 0.1], goal=[0.9, 0.9])
        paths = c.plan_batch(requests)          # ONE server dispatch
        episode = c.mpc(start=..., goal=...)    # closed-loop

    with PlanningClient.spawn(["--preset", "planning",
                               "--workdir", "/tmp/run"]) as c:
        ...   # owns a `cli serve` subprocess over pipes

Intentionally dependency-free (stdlib only) so it can be vendored into
a deployment that does not carry JAX — the protocol is plain JSON
lines.  Server-side behavior (bucketing, coalescing, error isolation)
is documented in docs/deployment.md.
"""

from __future__ import annotations

import json
import socket
import subprocess
import sys
import time
from typing import IO, Any


class ServerError(RuntimeError):
    """The server answered `{"error": ...}` for a request.

    Raised per-request: in a batch, only the failed positions raise /
    carry errors (`plan_batch(..., raise_on_error=False)` returns the
    raw per-position dicts instead).
    """


class Overloaded(ServerError):
    """The server shed the request at admission (`{"error":
    "overloaded", "retry_ms": N}`) or at its queueing deadline
    (`{"error": "deadline_exceeded"}`).  ``retry_ms`` carries the
    server's drain estimate (0 when the reply had none)."""

    def __init__(self, message: str, retry_ms: int = 0):
        super().__init__(message)
        self.retry_ms = int(retry_ms)


class PlanningClient:
    """One protocol connection: a writable line sink + readable source.

    Not thread-safe — the protocol answers in request order on one
    stream, so interleaved writers would mis-pair responses.  Open one
    client per thread (the TCP server is thread-per-connection and
    shares the compiled programs, so extra connections are cheap).
    """

    def __init__(self, reader: IO[str], writer: IO[str],
                 _owned: tuple = ()):
        self._reader = reader
        self._writer = writer
        self._owned = _owned  # resources to close/terminate with us
        self._closed = False

    # -- constructors ----------------------------------------------------

    @classmethod
    def tcp(cls, host: str = "127.0.0.1", port: int = 7421,
            timeout: float | None = 600.0) -> "PlanningClient":
        """Connect to a running `cli serve --tcp` server.

        ``timeout`` bounds every protocol read (default 10 min — the
        first request of a bucket size may sit behind a 90-300 s remote
        compile on the TPU tunnel; pass None to wait forever).
        """
        sock = socket.create_connection((host, port), timeout=timeout)
        return cls(sock.makefile("r", encoding="utf-8"),
                   sock.makefile("w", encoding="utf-8"),
                   _owned=(sock,))

    @classmethod
    def spawn(cls, serve_args: list[str], python: str = sys.executable,
              module: str = "ndivplanning_tpu.cli",
              env: dict[str, str] | None = None) -> "PlanningClient":
        """Spawn `python -m ndivplanning_tpu.cli serve <args>` and talk
        to it over its stdin/stdout pipes.  The child is terminated on
        ``close()`` if `quit` did not already end it.  ``module``/``env``
        exist for embedders (and tests) that wrap the CLI in their own
        entrypoint — e.g. one that pins the backend first."""
        proc = subprocess.Popen(
            [python, "-m", module, "serve", *serve_args],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            text=True, bufsize=1, env=env)
        return cls(proc.stdout, proc.stdin, _owned=(proc,))

    # -- protocol --------------------------------------------------------

    def _send_line(self, line: str) -> Any:
        """One raw protocol line out, one JSON response line back."""
        if self._closed:
            raise RuntimeError("client is closed")
        self._writer.write(line + "\n")
        self._writer.flush()
        resp = self._reader.readline()
        if not resp:
            raise ConnectionError("server closed the connection")
        return json.loads(resp)

    def _round_trip(self, payload: Any) -> Any:
        return self._send_line(json.dumps(payload))

    @staticmethod
    def _raise_for_error(resp: Any) -> None:
        if isinstance(resp, dict) and "error" in resp:
            err = resp["error"]
            if err in ("overloaded", "deadline_exceeded"):
                raise Overloaded(err, resp.get("retry_ms", 0))
            raise ServerError(err)

    def plan(self, start, goal, obstacles=None, *, mpc: bool = False,
             retries: int = 0, **extra) -> dict:
        """Plan one scene; returns the response dict (`best_traj`,
        `best_score`, ... or MPC episode fields when ``mpc=True``).
        Raises :class:`ServerError` on an error reply — shed replies
        raise the :class:`Overloaded` subclass carrying the server's
        ``retry_ms`` drain estimate.  ``retries > 0`` makes the client
        honor that hint itself: sleep ``retry_ms`` (or 50 ms for a
        deadline shed, which carries none) and resend, up to ``retries``
        times, before letting :class:`Overloaded` escape."""
        req = {"start": list(start), "goal": list(goal), **extra}
        if obstacles is not None:
            req["obstacles"] = [list(o) for o in obstacles]
        if mpc:
            req["mpc"] = True
        attempts = max(int(retries), 0) + 1
        for i in range(attempts):
            resp = self._round_trip(req)
            try:
                self._raise_for_error(resp)
                return resp
            except Overloaded as e:
                if i + 1 >= attempts:
                    raise
                # Honor the server's drain estimate VERBATIM when the
                # reply carried one (retry_ms > 0) — clamping it up to
                # 50 ms would override a fast-drain hint (ADVICE r4);
                # 50 ms is only the fallback for deadline sheds, whose
                # replies carry no hint.
                time.sleep((e.retry_ms if e.retry_ms > 0 else 50) / 1000.0)
        raise AssertionError("unreachable")

    def plan_batch(self, requests: list[dict], *,
                   raise_on_error: bool = True) -> list[dict]:
        """Plan many scenes in ONE bucketed server dispatch (a JSON
        array line).  Error isolation is per-position: with
        ``raise_on_error`` (default) the first failed position raises;
        otherwise the raw per-position dicts come back and callers
        check for ``"error"`` themselves."""
        resp = self._round_trip(list(requests))
        if raise_on_error:
            for i, r in enumerate(resp):
                if isinstance(r, dict) and "error" in r:
                    # Shed positions keep their Overloaded type (and
                    # retry_ms hint) so batch callers can back off the
                    # same way plan(retries=...) does.
                    try:
                        self._raise_for_error(r)
                    except ServerError as e:
                        e.args = (f"request {i}: {e.args[0]}",
                                  *e.args[1:])
                        raise
        return resp

    def mpc(self, start, goal, obstacles=None, **extra) -> dict:
        """Closed-loop episode (`path`, `reached`, `n_replans`, ...)."""
        return self.plan(start, goal, obstacles, mpc=True, **extra)

    def stats(self) -> dict:
        """Process-level serving counters (the `stats` protocol line):
        dispatches, requests, mean dispatch batch, pad fraction."""
        return self._send_line("stats")

    def reload(self) -> dict:
        """Hot-swap the server to its workdir's latest best checkpoint
        (the `reload` protocol line; zero recompiles).  Returns
        ``{"reloaded": true, "step": N}`` or raises
        :class:`ServerError`."""
        resp = self._send_line("reload")
        if isinstance(resp, dict) and "error" in resp:
            raise ServerError(resp["error"])
        return resp

    # -- lifecycle -------------------------------------------------------

    def close(self) -> None:
        """Send `quit`, then release the transport (idempotent)."""
        if self._closed:
            return
        self._closed = True
        try:
            self._writer.write("quit\n")
            self._writer.flush()
        except (OSError, ValueError):
            pass  # transport already gone; still release resources
        for f in (self._reader, self._writer):
            try:
                f.close()
            except Exception:  # noqa: BLE001
                pass
        for res in self._owned:
            if isinstance(res, subprocess.Popen):
                try:
                    res.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    res.terminate()
                    try:
                        res.wait(timeout=5)
                    except subprocess.TimeoutExpired:
                        res.kill()
            else:
                try:
                    res.close()
                except Exception:  # noqa: BLE001
                    pass

    def __enter__(self) -> "PlanningClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
