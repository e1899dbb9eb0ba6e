"""Planning server tests (serving path)."""

import io
import json
import threading

from ndivplanning_tpu.planning.server import handle_request, serve
from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.utils.config import get_config

import jax


def _cfg():
    return get_config("planning", batch_size=4, k=4, g_hidden=(32,),
                      d_hidden=(32,), cond_embed_dim=8, image_size=16,
                      n_candidates=32)


def test_handle_request():
    cfg = _cfg()
    state = create_train_state(cfg)
    req = {"start": [0.1, 0.1], "goal": [0.9, 0.9],
           "obstacles": [[0.5, 0.5, 0.1]]}
    resp = handle_request(cfg, state, req, jax.random.PRNGKey(0))
    assert len(resp["best_traj"]) == cfg.horizon
    assert len(resp["diverse_trajs"]) == 4
    assert "latency_ms" in resp


def test_serve_loop_and_error_isolation():
    cfg = _cfg()
    state = create_train_state(cfg)
    stdin = io.StringIO(
        json.dumps({"start": [0.1, 0.1], "goal": [0.9, 0.9]}) + "\n"
        + "not json\n"
        + json.dumps({"start": [0.2, 0.2], "goal": [0.8, 0.8]}) + "\n"
        + "quit\n"
    )
    stdout = io.StringIO()
    served = serve(cfg, state, stdin=stdin, stdout=stdout)
    assert served == 3
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert "best_score" in lines[0]
    assert "error" in lines[1]  # bad request isolated, server kept going
    assert "best_score" in lines[2]


def test_list_request_single_dispatch():
    # A JSON-array line plans all scenes in one batched dispatch and is
    # answered with a JSON array (VERDICT round-1 missing #5).
    cfg = _cfg()
    state = create_train_state(cfg)
    reqs = [{"start": [0.1 * i, 0.1], "goal": [0.9, 0.9 - 0.05 * i]}
            for i in range(3)]
    stdin = io.StringIO(json.dumps(reqs) + "\nquit\n")
    stdout = io.StringIO()
    served = serve(cfg, state, stdin=stdin, stdout=stdout)
    assert served == 1
    out = json.loads(stdout.getvalue().splitlines()[0])
    assert isinstance(out, list) and len(out) == 3
    for r in out:
        assert len(r["best_traj"]) == cfg.horizon
        assert r["batch_size"] == 4  # 3 requests pad to the 4-bucket


def test_burst_coalesces_16_scenes():
    # 16 pending lines drain into shared plan_batch dispatches.
    cfg = _cfg()
    state = create_train_state(cfg)
    lines = [json.dumps({"start": [0.05 + 0.05 * i, 0.1],
                         "goal": [0.9, 0.9]}) for i in range(16)]
    stdin = io.StringIO("\n".join(lines) + "\nquit\n")
    stdout = io.StringIO()
    served = serve(cfg, state, stdin=stdin, stdout=stdout)
    assert served == 16
    outs = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert len(outs) == 16
    assert all(o["batch_size"] == 16 for o in outs)
    # distinct starts produced distinct plans (not one broadcast answer)
    firsts = {tuple(o["best_traj"][0]) for o in outs}
    assert len(firsts) > 1


def test_batch_error_isolation():
    from ndivplanning_tpu.planning.server import handle_batch

    cfg = _cfg()
    state = create_train_state(cfg)
    reqs = [{"start": [0.1, 0.1], "goal": [0.9, 0.9]},
            {"goal": [0.9, 0.9]},  # missing start
            {"start": [0.2, 0.2], "goal": [0.8, 0.8]}]
    out = handle_batch(cfg, state, reqs, jax.random.PRNGKey(0))
    assert "best_score" in out[0]
    assert "error" in out[1]
    assert "best_score" in out[2]


def test_empty_array_request():
    # '[]' as first line must answer '[]', not crash the loop (round-2
    # review finding).
    cfg = _cfg()
    state = create_train_state(cfg)
    stdin = io.StringIO("[]\n"
                        + json.dumps({"start": [0.1, 0.1],
                                      "goal": [0.9, 0.9]}) + "\nquit\n")
    stdout = io.StringIO()
    served = serve(cfg, state, stdin=stdin, stdout=stdout)
    assert served == 2
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert lines[0] == []
    assert "best_score" in lines[1]


def test_burst_coalesces_through_real_pipe():
    """Coalescing must engage when a burst arrives via a REAL pipe in one
    write: the raw-fd reader sees lines the TextIOWrapper would have
    hidden in its buffer (round-2 review finding)."""
    import os

    cfg = _cfg()
    state = create_train_state(cfg)
    r_fd, w_fd = os.pipe()
    lines = [json.dumps({"start": [0.05 + 0.05 * i, 0.1],
                         "goal": [0.9, 0.9]}) for i in range(4)]
    payload = ("\n".join(lines) + "\nquit\n").encode()
    os.write(w_fd, payload)
    os.close(w_fd)
    with os.fdopen(r_fd, "r") as stdin:
        stdout = io.StringIO()
        served = serve(cfg, state, stdin=stdin, stdout=stdout)
    assert served == 4
    outs = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert all(o["batch_size"] == 4 for o in outs), \
        [o["batch_size"] for o in outs]


def test_serve_with_refinement_modes():
    """refine='cem'/'grad' serve latent-refined plans through the same
    bucketed batch path (one line + a 2-array line)."""
    cfg = _cfg()
    state = create_train_state(cfg)
    reqs = (
        json.dumps({"start": [0.1, 0.1], "goal": [0.9, 0.9]}) + "\n"
        + json.dumps([{"start": [0.2, 0.2], "goal": [0.8, 0.8]},
                      {"start": [0.3, 0.1], "goal": [0.7, 0.9]}]) + "\n"
        + "quit\n"
    )
    for refine in ("cem", "grad"):
        stdout = io.StringIO()
        served = serve(cfg, state, stdin=io.StringIO(reqs), stdout=stdout,
                       refine=refine)
        assert served == 2
        lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
        assert "best_score" in lines[0]
        assert isinstance(lines[1], list) and len(lines[1]) == 2
        assert all("best_score" in r for r in lines[1])


def test_serve_survives_adversarial_lines():
    """Fuzz the line protocol: every malformed input gets an isolated
    {"error": ...} reply (or is skipped when blank) and the server keeps
    serving valid requests afterwards."""
    cfg = _cfg()
    state = create_train_state(cfg)
    bad_lines = [
        "{}",                                     # missing keys
        json.dumps({"start": [0.1], "goal": [0.9, 0.9]}),   # bad shape
        json.dumps({"start": "x", "goal": [0.9, 0.9]}),     # bad type
        json.dumps({"start": [0.1, 0.1], "goal": [0.9, 0.9],
                    "obstacles": [[0.5]]}),       # bad obstacle arity
        json.dumps([1, 2, 3]),                    # array of non-objects
        "null",
        "[",                                      # truncated json
        "\x00\xff garbage",
    ]
    good = json.dumps({"start": [0.1, 0.1], "goal": [0.9, 0.9]})
    stdin = io.StringIO("\n".join(bad_lines + [good, "quit"]) + "\n")
    stdout = io.StringIO()
    serve(cfg, state, stdin=stdin, stdout=stdout)
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert len(lines) == len(bad_lines) + 1
    for reply in lines[:-1]:
        if isinstance(reply, list):
            assert all("error" in r for r in reply)
        else:
            assert "error" in reply
    assert "best_score" in lines[-1]


def test_warmup_precompiles_all_buckets():
    """warmup() leaves every bucket program in the jit cache: serving
    any burst size afterwards triggers ZERO new backend compilations
    (on the TPU tunnel each one would be 90-300 s of live latency)."""
    from ndivplanning_tpu.planning.server import warmup
    from ndivplanning_tpu.utils.compile_guard import start_compile_count

    cfg = _cfg()
    state = create_train_state(cfg)
    secs = warmup(cfg, state)
    assert secs > 0

    rec, stop = start_compile_count()
    try:
        stdin = io.StringIO(
            json.dumps({"start": [0.3, 0.2], "goal": [0.7, 0.8]}) + "\n"
            + json.dumps([{"start": [0.1 * i, 0.1], "goal": [0.9, 0.8]}
                          for i in range(5)]) + "\n"
            + "quit\n")
        stdout = io.StringIO()
        served = serve(cfg, state, stdin=stdin, stdout=stdout)
    finally:
        stop()
    assert served == 2
    assert rec.count == 0, f"post-warmup compiles: {rec.names}"


def test_mpc_request_path(monkeypatch):
    """'mpc': true requests get closed-loop responses; plan and MPC
    requests mix freely in one batch with per-position responses."""
    from ndivplanning_tpu.planning import server as srv

    monkeypatch.setattr(srv, "MPC_TOTAL_STEPS", 8)
    monkeypatch.setattr(srv, "MPC_REPLAN_EVERY", 4)
    monkeypatch.setattr(srv, "MPC_CANDIDATES", 8)
    cfg = _cfg()
    state = create_train_state(cfg)
    reqs = [
        {"start": [0.1, 0.1], "goal": [0.9, 0.9]},
        {"start": [0.2, 0.1], "goal": [0.9, 0.8], "mpc": True},
        {"start": "bad", "goal": [0.9, 0.8], "mpc": True},
    ]
    from ndivplanning_tpu.planning.server import handle_batch

    resps = handle_batch(cfg, state, reqs, jax.random.PRNGKey(0))
    assert "best_traj" in resps[0]
    assert len(resps[1]["path"]) == 8
    assert resps[1]["n_replans"] == 2
    assert resps[1]["reached"] in (0.0, 1.0)
    assert "error" in resps[2]  # malformed MPC request isolated


def test_warmup_covers_mpc_buckets(monkeypatch):
    from ndivplanning_tpu.planning import server as srv
    from ndivplanning_tpu.planning.server import handle_batch, warmup
    from ndivplanning_tpu.utils.compile_guard import count_compiles

    monkeypatch.setattr(srv, "MPC_TOTAL_STEPS", 8)
    monkeypatch.setattr(srv, "MPC_REPLAN_EVERY", 4)
    monkeypatch.setattr(srv, "MPC_CANDIDATES", 8)
    cfg = _cfg()
    state = create_train_state(cfg)
    warmup(cfg, state, buckets=(1, 2), mpc=True)
    with count_compiles() as rec:
        handle_batch(cfg, state,
                     [{"start": [0.3, 0.1], "goal": [0.8, 0.9],
                       "mpc": True}],
                     jax.random.PRNGKey(1))
    assert rec.count == 0, f"unexpected recompiles: {rec.names}"


def test_per_request_latency_shows_queue_time():
    """Round-2 verdict weak #7: latency_ms must be per-request
    queue+service time — a request planned in the SECOND chunk of a
    burst larger than the max bucket must show more latency than the
    first chunk's requests (it queued behind their dispatch), and
    per-request times within one handle_batch call must be
    non-decreasing in chunk order."""
    from ndivplanning_tpu.planning.server import BUCKETS, handle_batch

    cfg = _cfg()
    state = create_train_state(cfg)
    n = BUCKETS[-1] + 4  # forces two chunks (16 + 4)
    reqs = [{"start": [0.1, 0.1], "goal": [0.9, 0.9]} for _ in range(n)]
    # Warm both bucket programs so compile time doesn't mask queueing.
    handle_batch(cfg, state, reqs, jax.random.PRNGKey(0))
    resps = handle_batch(cfg, state, reqs, jax.random.PRNGKey(1))
    first_chunk = [r["latency_ms"] for r in resps[:BUCKETS[-1]]]
    second_chunk = [r["latency_ms"] for r in resps[BUCKETS[-1]:]]
    # Second chunk queued behind the first chunk's dispatch.
    assert min(second_chunk) >= max(first_chunk)
    assert max(first_chunk) > 0


def test_serve_overlap_matches_synchronous():
    """The writer-thread pipeline (overlap=True) must produce the exact
    same ordered output as the synchronous path."""
    cfg = _cfg()
    state = create_train_state(cfg)
    reqs = (
        json.dumps({"start": [0.1, 0.1], "goal": [0.9, 0.9]}) + "\n"
        + "not json\n"
        + json.dumps([{"start": [0.2, 0.2], "goal": [0.8, 0.8]},
                      {"start": [0.3, 0.2], "goal": [0.7, 0.8]}]) + "\n"
        + "quit\n"
    )
    outs = []
    for overlap in (False, True):
        stdout = io.StringIO()
        served = serve(cfg, state, stdin=io.StringIO(reqs),
                       stdout=stdout, overlap=overlap)
        assert served == 3
        lines = stdout.getvalue().splitlines()
        assert len(lines) == 3
        # Normalise the timing field before comparing.
        parsed = [json.loads(l) for l in lines]
        def strip(obj):
            if isinstance(obj, list):
                return [strip(o) for o in obj]
            return {k: v for k, v in obj.items() if k != "latency_ms"}
        outs.append([strip(p) for p in parsed])
    assert outs[0] == outs[1]


def test_response_writer_error_falls_back_synchronous():
    """A writer-thread write error surfaces once at the next push and
    later pushes fall back to synchronous writes instead of deadlocking
    the bounded queue behind a dead consumer thread."""
    import time as _time

    from ndivplanning_tpu.planning.server import _ResponseWriter

    class FlakyOut:
        def __init__(self):
            self.fail = True
            self.lines = []

        def write(self, s):
            if self.fail:
                raise BrokenPipeError("client went away")
            self.lines.append(s)

        def flush(self):
            pass

    out = FlakyOut()
    w = _ResponseWriter(out, overlap=True)
    w.push({"a": 1})  # consumed by the thread, which dies on write
    deadline = _time.time() + 5
    surfaced = False
    while _time.time() < deadline:
        try:
            w.push({"a": 2})
        except BrokenPipeError:
            surfaced = True
            break
        _time.sleep(0.01)
    assert surfaced, "writer-thread error never surfaced"
    # The stream recovers; pushes now write synchronously in order.
    out.fail = False
    w.push({"a": 3})
    w.push({"a": 4})
    w.close()
    assert [json.loads(l) for l in out.lines] == [{"a": 3}, {"a": 4}]


def test_mixed_burst_plan_responses_written_before_mpc(monkeypatch):
    """Round-3 review: a plan line earlier in the burst is WRITTEN
    before a later MPC line's episode runs (eager in-order flush via
    handle_batch's on_progress), instead of buffering behind it."""
    from ndivplanning_tpu.planning import server as srv

    monkeypatch.setattr(srv, "MPC_TOTAL_STEPS", 8)
    monkeypatch.setattr(srv, "MPC_REPLAN_EVERY", 4)
    monkeypatch.setattr(srv, "MPC_CANDIDATES", 8)
    cfg = _cfg()
    state = create_train_state(cfg)
    stdout = io.StringIO()
    seen_at_mpc = {}

    real = srv._handle_mpc

    def spy(*args, **kwargs):
        seen_at_mpc["lines_written"] = stdout.getvalue().count("\n")
        return real(*args, **kwargs)

    monkeypatch.setattr(srv, "_handle_mpc", spy)
    stdin = io.StringIO(
        json.dumps({"start": [0.1, 0.1], "goal": [0.9, 0.9]}) + "\n"
        + json.dumps({"start": [0.2, 0.1], "goal": [0.9, 0.8],
                      "mpc": True}) + "\n"
        + "quit\n")
    served = serve(cfg, state, stdin=stdin, stdout=stdout, overlap=False)
    assert served == 2
    # The open-loop plan response was already on the wire when the
    # closed-loop episode started.
    assert seen_at_mpc["lines_written"] == 1
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert "best_traj" in lines[0] and "path" in lines[1]
    # And the MPC line's latency includes the episode it computed.
    assert lines[1]["latency_ms"] >= lines[0]["latency_ms"]


def test_writer_close_does_not_hang_on_dead_thread_full_queue():
    """Round-3 review: close() must not block forever when the writer
    thread died (write error) while the bounded queue is full — the
    DONE sentinel put is only retried while the thread is alive."""
    import time as _time

    import pytest

    from ndivplanning_tpu.planning.server import _ResponseWriter

    class _DeadPipe(io.StringIO):
        def write(self, s):
            raise OSError("client gone")

    w = _ResponseWriter(_DeadPipe(), overlap=True)
    w._q.put({"a": 1})  # thread pops it, write raises, thread dies
    for _ in range(500):
        if not w._thread.is_alive():
            break
        _time.sleep(0.01)
    assert not w._thread.is_alive()
    for i in range(4):  # fill the queue with nobody draining
        w._q.put({"i": i}, timeout=1)
    with pytest.raises(OSError):
        w.close()  # pre-fix: blocked forever on the sentinel put


def _tcp_client_lines(host, port, payload, n_replies):
    """Send payload over a fresh TCP connection, read n_replies lines."""
    import socket

    with socket.create_connection((host, port), timeout=30) as s:
        s.sendall(payload.encode())
        f = s.makefile("r", encoding="utf-8")
        return [json.loads(f.readline()) for _ in range(n_replies)]


def test_serve_tcp_round_trip():
    """TCP serving answers the same JSON-lines protocol per connection,
    sequential connections share the compiled bucket programs, and
    lines_served aggregates across connections."""
    import threading

    from ndivplanning_tpu.planning.server import serve_tcp
    from ndivplanning_tpu.utils.compile_guard import count_compiles

    cfg = _cfg()
    state = create_train_state(cfg)
    server = serve_tcp(cfg, state, port=0)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        req = json.dumps({"start": [0.1, 0.1], "goal": [0.9, 0.9]})
        lines = _tcp_client_lines(host, port, req + "\nquit\n", 1)
        assert "best_score" in lines[0]
        assert len(lines[0]["best_traj"]) == cfg.horizon
        # Second connection, same 1-bucket: zero new compilations (the
        # whole point of sharing state + jit cache across connections).
        with count_compiles() as rec:
            req2 = json.dumps({"start": [0.2, 0.2], "goal": [0.8, 0.8]})
            out = _tcp_client_lines(host, port, req2 + "\nquit\n", 1)
        assert "best_score" in out[0]
        assert rec.count == 0, f"second connection recompiled: {rec.names}"
    finally:
        server.shutdown()
        server.server_close()
    assert server.lines_served == 2  # one line per connection


def test_serve_tcp_error_isolation_and_disconnect():
    """A malformed line gets an isolated error reply over TCP, and an
    abrupt client disconnect mid-stream leaves the server serving new
    connections."""
    import socket
    import threading

    from ndivplanning_tpu.planning.server import serve_tcp

    cfg = _cfg()
    state = create_train_state(cfg)
    server = serve_tcp(cfg, state, port=0)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # Abrupt disconnect: send a request then slam the socket shut
        # without reading the reply.
        s = socket.create_connection((host, port), timeout=30)
        s.sendall((json.dumps({"start": [0.1, 0.1],
                               "goal": [0.9, 0.9]}) + "\n").encode())
        s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER,
                     b"\x01\x00\x00\x00\x00\x00\x00\x00")  # RST on close
        s.close()
        # Server must still answer a fresh connection, errors isolated.
        payload = ("not json\n"
                   + json.dumps({"start": [0.2, 0.2],
                                 "goal": [0.8, 0.8]}) + "\nquit\n")
        lines = _tcp_client_lines(host, port, payload, 2)
        assert "error" in lines[0]
        assert "best_score" in lines[1]
    finally:
        server.shutdown()
        server.server_close()


def test_cross_batcher_coalesces_across_submits(monkeypatch):
    """While the dispatcher is busy with dispatch N, submits from other
    connections accumulate and ride dispatch N+1 TOGETHER (the whole
    point: N single-request clients != N serial bucket-1 dispatches)."""
    import threading as _threading

    from ndivplanning_tpu.planning import server as srv
    from ndivplanning_tpu.planning.server import _CrossBatcher

    cfg = _cfg()
    state = create_train_state(cfg)
    gate = _threading.Event()
    sizes = []
    real = srv.handle_batch

    def gated(cfg_, state_, reqs, key, **kw):
        sizes.append(len(reqs))
        if len(sizes) == 1:
            gate.wait(timeout=60)  # hold dispatch 1 while others queue
        return real(cfg_, state_, reqs, key, **kw)

    monkeypatch.setattr(srv, "handle_batch", gated)
    b = _CrossBatcher(cfg, state)
    try:
        first = b.submit([{"start": [0.1, 0.1], "goal": [0.9, 0.9]}],
                         0.0)
        while not sizes:  # dispatcher picked up the first request
            pass
        later = [b.submit([{"start": [0.1 + 0.05 * i, 0.1],
                            "goal": [0.9, 0.9]}], 0.0)[0]
                 for i in range(5)]
        gate.set()
        for p in first + later:
            assert p.event.wait(timeout=120)
            assert "best_score" in p.result, p.result
        assert sizes == [1, 5]  # the 5 queued requests shared a dispatch
        assert all(p.result["batch_size"] == 8 for p in later)  # bucket
        # Distinct starts got distinct plans — no cross-request mixups.
        firsts = {tuple(p.result["best_traj"][0]) for p in later}
        assert len(firsts) > 1
    finally:
        gate.set()
        b.close()


def test_serve_tcp_cross_batch_concurrent_clients():
    """End-to-end: concurrent TCP clients under cross_batch=True each
    get their own correct response (error isolation included), and the
    dispatcher's error handling keeps the server healthy."""
    import socket

    from ndivplanning_tpu.planning.server import serve_tcp

    cfg = _cfg()
    state = create_train_state(cfg)
    server = serve_tcp(cfg, state, port=0, cross_batch=True)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    results: dict[int, list] = {}

    def client(i: int) -> None:
        if i == 2:  # one malformed request among the crowd
            payload = json.dumps({"goal": [0.9, 0.9]}) + "\nquit\n"
        else:
            payload = json.dumps({"start": [0.1 + 0.05 * i, 0.1],
                                  "goal": [0.9, 0.9]}) + "\nquit\n"
        results[i] = _tcp_client_lines(host, port, payload, 1)

    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=300)
        assert sorted(results) == list(range(6))
        assert "error" in results[2][0]
        firsts = set()
        for i in (0, 1, 3, 4, 5):
            resp = results[i][0]
            assert "best_score" in resp, resp
            firsts.add(tuple(resp["best_traj"][0]))
        assert len(firsts) > 1  # per-client answers, not one broadcast
    finally:
        server.shutdown()
        server.server_close()


def test_cross_batcher_close_fails_queued_requests():
    """close() with requests still queued answers them with an error
    instead of leaving connection threads blocked forever."""
    import threading as _threading

    from ndivplanning_tpu.planning import server as srv
    from ndivplanning_tpu.planning.server import _CrossBatcher

    cfg = _cfg()
    state = create_train_state(cfg)
    gate = _threading.Event()
    n_calls = []
    real = srv.handle_batch

    def gated(*args, **kw):
        n_calls.append(1)
        gate.wait(timeout=60)
        return real(*args, **kw)

    import pytest as _pytest

    mp = _pytest.MonkeyPatch()
    mp.setattr(srv, "handle_batch", gated)
    try:
        b = _CrossBatcher(cfg, state)
        # Requests queued BEFORE close drain normally (the dispatcher
        # re-posts the sentinel behind in-flight work)...
        pre = b.submit([{"start": [0.2, 0.1], "goal": [0.9, 0.9]}],
                       0.0)[0]
        while not n_calls:
            pass
        closer = _threading.Thread(target=b.close, daemon=True)
        closer.start()
        while b._q.qsize() < 1:  # sentinel queued (pre already dequeued)
            pass
        # ...requests landing AFTER the sentinel are failed, not hung.
        post = b.submit([{"start": [0.3, 0.1], "goal": [0.9, 0.9]}],
                        0.0)[0]
        gate.set()  # dispatch 1 completes; dispatcher drains and exits
        assert pre.event.wait(timeout=120)
        assert "best_score" in pre.result, pre.result
        assert post.event.wait(timeout=120)
        assert "error" in post.result, post.result
        closer.join(timeout=60)
        assert not closer.is_alive()
    finally:
        gate.set()
        mp.undo()


def test_stats_protocol_line():
    """A literal `stats` line answers with the process counters, in
    protocol order (a stats line after requests in the same burst sees
    their dispatches), and the client helper parses it."""
    from ndivplanning_tpu.planning.server import serve_tcp

    from ndivplanning_tpu.planning.client import PlanningClient

    cfg = _cfg()
    state = create_train_state(cfg)
    # stdin path: request then stats in ONE burst -> the stats response
    # reflects the request's dispatch.
    stdin = io.StringIO(
        json.dumps({"start": [0.1, 0.1], "goal": [0.9, 0.9]}) + "\n"
        + "stats\nquit\n")
    stdout = io.StringIO()
    served = serve(cfg, state, stdin=stdin, stdout=stdout)
    assert served == 2
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert "best_score" in lines[0]
    stats = lines[1]
    assert stats["dispatches"] >= 1
    assert stats["requests"] >= 1
    assert 0.0 <= stats["pad_fraction"] <= 1.0
    assert stats["mean_dispatch_batch"] >= 1.0
    # TCP + client helper: counters are process-wide and monotone.
    server = serve_tcp(cfg, state, port=0)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with PlanningClient.tcp(host, port) as c:
            before = c.stats()
            c.plan(start=[0.2, 0.1], goal=[0.9, 0.9])
            after = c.stats()
        assert after["dispatches"] == before["dispatches"] + 1
        assert after["requests"] == before["requests"] + 1
    finally:
        server.shutdown()
        server.server_close()


def test_reload_hot_swaps_weights_zero_recompile():
    """The `reload` line swaps the served weights mid-session: plans
    change, step is reported, NO recompilation happens (same pytree
    shapes), and requests after the reload in the SAME burst already
    use the new state.  Without a checkpoint source the line errors
    cleanly."""
    import jax.numpy as jnp

    from ndivplanning_tpu.utils.compile_guard import count_compiles

    cfg = _cfg()
    state_a = create_train_state(cfg, seed=0)
    state_b = create_train_state(cfg, seed=1)
    req = json.dumps({"start": [0.1, 0.1], "goal": [0.9, 0.9]})

    def plan_once(state, reload_lines="", reload_fn=None):
        stdin = io.StringIO(reload_lines + req + "\nquit\n")
        stdout = io.StringIO()
        serve(cfg, state, stdin=stdin, stdout=stdout, reload_fn=reload_fn)
        return [json.loads(l) for l in stdout.getvalue().splitlines()]

    base = plan_once(state_a)[0]
    swapped = plan_once(state_b)[0]
    assert base["best_traj"] != swapped["best_traj"]  # distinct weights

    # One serve session: plan on A, reload -> B, plan again.  The
    # reload answer is in protocol order; the pre-reload plan ran on
    # the OLD weights (reload is a segment boundary, not
    # whole-burst-retroactive) and the post-reload one matches B's plan
    # at the session's exact key stream (one split per segment).
    state_b = state_b.replace(step=jnp.asarray(123, jnp.int32))
    stdin = io.StringIO(req + "\nreload\n" + req + "\nquit\n")
    stdout = io.StringIO()
    with count_compiles() as rec:
        served = serve(cfg, state_a, stdin=stdin, stdout=stdout,
                       reload_fn=lambda: state_b)
    assert served == 3
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert lines[0]["best_traj"] == base["best_traj"]
    assert lines[1] == {"reloaded": True, "step": 123}
    from ndivplanning_tpu.planning.server import handle_batch

    key = jax.random.PRNGKey(0)
    key, _sub1 = jax.random.split(key)  # segment 1's draw (state A)
    _key, sub2 = jax.random.split(key)  # segment 2's draw (state B)
    want = handle_batch(cfg, state_b, [json.loads(req)], sub2)[0]
    assert lines[2]["best_traj"] == want["best_traj"]
    assert rec.count == 0, f"reload recompiled: {rec.names}"

    # No reload_fn (no workdir): clean per-line error, serving continues.
    lines = plan_once(state_a, reload_lines="reload\n")
    assert "error" in lines[0] and "best_traj" in lines[1]
    # reload_fn finding no checkpoint: clean error too.
    lines = plan_once(state_a, reload_lines="reload\n",
                      reload_fn=lambda: None)
    assert "error" in lines[0] and "best_traj" in lines[1]


def test_reload_swaps_cross_batcher_state():
    """In cross-batch TCP mode a reload must swap the DISPATCHER's
    state — the connection-local rebind alone would leave other
    clients on the old weights."""
    from ndivplanning_tpu.planning.client import PlanningClient
    from ndivplanning_tpu.planning.server import serve_tcp

    cfg = _cfg()
    state_a = create_train_state(cfg, seed=0)
    state_b = create_train_state(cfg, seed=1)
    server = serve_tcp(cfg, state_a, port=0, cross_batch=True,
                       reload_fn=lambda: state_b)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with PlanningClient.tcp(host, port) as c1:
            before = c1.plan(start=[0.1, 0.1], goal=[0.9, 0.9])
            info = c1.reload()
            assert info["reloaded"] is True
        # A DIFFERENT connection (fresh serve loop, same batcher) now
        # serves the swapped weights.
        with PlanningClient.tcp(host, port) as c2:
            after = c2.plan(start=[0.1, 0.1], goal=[0.9, 0.9])
        assert before["best_traj"] != after["best_traj"]
    finally:
        server.shutdown()
        server.server_close()


def test_best_watcher_detects_marker_change(tmp_path):
    from ndivplanning_tpu.planning.server import SERVING_STATS, BestWatcher

    marker = tmp_path / "best_path.json"
    loads = []
    sentinel = object()

    def reload_fn():
        loads.append(1)
        return sentinel

    # Long poll interval: the thread stays asleep and the test drives
    # check_now() deterministically.
    w = BestWatcher(reload_fn, str(marker), poll_s=3600.0)
    try:
        assert w.check_now() is False  # no marker yet
        assert w.current() == (0, None)

        marker.write_text('{"path": "a", "value": 0.5}')
        before = SERVING_STATS["auto_reloads"]
        swaps = []
        w.on_swap(swaps.append)
        assert w.check_now() is True
        ver, st = w.current()
        assert ver == 1 and st is sentinel
        assert swaps == [sentinel]
        assert SERVING_STATS["auto_reloads"] == before + 1

        assert w.check_now() is False  # unchanged marker: no reload
        assert loads == [1]

        marker.write_text('{"path": "b", "value": 0.75}')
        assert w.check_now() is True
        assert w.current()[0] == 2
    finally:
        w.stop()


def test_serve_uses_watcher_state(tmp_path):
    # A serving loop started (or a connection opened) AFTER the watcher
    # swapped must answer from the NEW weights, not the boot state.
    from ndivplanning_tpu.planning.server import BestWatcher

    cfg = _cfg()
    state_boot = create_train_state(cfg)
    state_new = create_train_state(cfg.replace(seed=cfg.seed + 100))

    marker = tmp_path / "best_path.json"
    w = BestWatcher(lambda: state_new, str(marker), poll_s=3600.0)
    try:
        marker.write_text("{}")
        assert w.check_now() is True

        req = json.dumps({"start": [0.1, 0.1], "goal": [0.9, 0.9]}) + "\nquit\n"
        out_watched = io.StringIO()
        serve(cfg, state_boot, stdin=io.StringIO(req), stdout=out_watched,
              watcher=w)
        out_new = io.StringIO()
        serve(cfg, state_new, stdin=io.StringIO(req), stdout=out_new)
        got = json.loads(out_watched.getvalue().splitlines()[0])
        want = json.loads(out_new.getvalue().splitlines()[0])
        assert got["best_traj"] == want["best_traj"]
        # ...and that differs from what the boot state would have said.
        out_boot = io.StringIO()
        serve(cfg, state_boot, stdin=io.StringIO(req), stdout=out_boot)
        boot = json.loads(out_boot.getvalue().splitlines()[0])
        assert boot["best_traj"] != want["best_traj"]
    finally:
        w.stop()


def test_cross_batcher_sheds_over_max_pending():
    """Admission control: once max_pending requests are queued or in
    flight, new submits are refused with {'error': 'overloaded',
    'retry_ms': ...} instead of growing the queue without bound — and a
    completed dispatch releases budget for later submits."""
    import threading as _threading
    import time as _time

    import pytest as _pytest

    from ndivplanning_tpu.planning import server as srv
    from ndivplanning_tpu.planning.server import SERVING_STATS, _CrossBatcher

    cfg = _cfg()
    state = create_train_state(cfg)
    gate = _threading.Event()
    n_calls = []
    real = srv.handle_batch

    def gated(*args, **kw):
        n_calls.append(1)
        gate.wait(timeout=60)
        return real(*args, **kw)

    mp = _pytest.MonkeyPatch()
    mp.setattr(srv, "handle_batch", gated)
    try:
        b = _CrossBatcher(cfg, state, max_pending=2)
        shed_before = SERVING_STATS["shed_requests"]
        first = b.submit([{"start": [0.1, 0.1], "goal": [0.9, 0.9]}],
                         _time.perf_counter())[0]
        while not n_calls:  # dispatcher holds request 1 in flight
            pass
        second = b.submit([{"start": [0.2, 0.1], "goal": [0.9, 0.9]}],
                          _time.perf_counter())[0]
        # Budget (2) is full: queued + in-flight both count.
        shed = b.submit([{"start": [0.3, 0.1], "goal": [0.9, 0.9]}],
                        _time.perf_counter())[0]
        assert shed.event.wait(timeout=5)
        assert shed.result["error"] == "overloaded", shed.result
        assert shed.result["retry_ms"] >= 1
        assert SERVING_STATS["shed_requests"] == shed_before + 1
        gate.set()
        for p in (first, second):
            assert p.event.wait(timeout=120)
            assert "best_score" in p.result, p.result
        # Completions released the budget: a new submit is admitted.
        third = b.submit([{"start": [0.4, 0.1], "goal": [0.9, 0.9]}],
                         _time.perf_counter())[0]
        assert third.event.wait(timeout=120)
        assert "best_score" in third.result, third.result
        b.close()
    finally:
        gate.set()
        mp.undo()


def test_cross_batcher_deadline_drops_stale():
    """An admitted request that queued past deadline_ms is answered
    {'error': 'deadline_exceeded'} at dispatch time — bounding the tail
    latency of everything actually served."""
    import threading as _threading
    import time as _time

    import pytest as _pytest

    from ndivplanning_tpu.planning import server as srv
    from ndivplanning_tpu.planning.server import SERVING_STATS, _CrossBatcher

    cfg = _cfg()
    state = create_train_state(cfg)
    gate = _threading.Event()
    n_calls = []
    real = srv.handle_batch

    def gated(*args, **kw):
        n_calls.append(1)
        gate.wait(timeout=60)
        return real(*args, **kw)

    mp = _pytest.MonkeyPatch()
    mp.setattr(srv, "handle_batch", gated)
    try:
        b = _CrossBatcher(cfg, state, deadline_ms=30.0)
        expired_before = SERVING_STATS["expired_requests"]
        first = b.submit([{"start": [0.1, 0.1], "goal": [0.9, 0.9]}],
                         _time.perf_counter())[0]
        while not n_calls:  # dispatch 1 held at the gate
            pass
        stale = b.submit([{"start": [0.2, 0.1], "goal": [0.9, 0.9]}],
                         _time.perf_counter())[0]
        _time.sleep(0.1)  # stale queues well past its 30 ms deadline
        gate.set()
        assert first.event.wait(timeout=120)
        assert "best_score" in first.result, first.result
        assert stale.event.wait(timeout=120)
        assert stale.result["error"] == "deadline_exceeded", stale.result
        assert stale.result["waited_ms"] > 30.0
        assert SERVING_STATS["expired_requests"] == expired_before + 1
        # The batcher keeps serving after drops: fresh request succeeds.
        fresh = b.submit([{"start": [0.3, 0.1], "goal": [0.9, 0.9]}],
                         _time.perf_counter())[0]
        assert fresh.event.wait(timeout=120)
        assert "best_score" in fresh.result, fresh.result
        b.close()
    finally:
        gate.set()
        mp.undo()


def test_stats_exposes_load_control_counters():
    from ndivplanning_tpu.planning.server import serving_stats

    s = serving_stats()
    assert "shed_requests" in s and "expired_requests" in s


def test_cross_batcher_admits_oversized_burst_when_idle():
    """A single burst larger than max_pending is admitted when nothing
    is pending (the dispatcher bucket-splits it); refusing it would make
    the burst unservable forever (round-4 review fix).  The cap still
    applies once work is pending."""
    import threading as _threading
    import time as _time

    import pytest as _pytest

    from ndivplanning_tpu.planning import server as srv
    from ndivplanning_tpu.planning.server import _CrossBatcher

    cfg = _cfg()
    state = create_train_state(cfg)

    b = _CrossBatcher(cfg, state, max_pending=2)
    burst = b.submit([{"start": [0.1 * (i + 1), 0.1], "goal": [0.9, 0.9]}
                      for i in range(5)], _time.perf_counter())
    for p in burst:
        assert p.event.wait(timeout=120)
        assert "best_score" in p.result, p.result
    b.close()

    # With one request in flight, a 5-burst exceeds the budget -> shed.
    gate = _threading.Event()
    n_calls = []
    real = srv.handle_batch

    def gated(*args, **kw):
        n_calls.append(1)
        gate.wait(timeout=60)
        return real(*args, **kw)

    mp = _pytest.MonkeyPatch()
    mp.setattr(srv, "handle_batch", gated)
    try:
        b2 = _CrossBatcher(cfg, state, max_pending=2)
        first = b2.submit([{"start": [0.1, 0.1], "goal": [0.9, 0.9]}],
                          _time.perf_counter())[0]
        while not n_calls:
            pass
        shed = b2.submit([{"start": [0.1 * (i + 1), 0.2],
                           "goal": [0.9, 0.9]} for i in range(5)],
                         _time.perf_counter())
        for p in shed:
            assert p.event.wait(timeout=5)
            assert p.result["error"] == "overloaded", p.result
        gate.set()
        assert first.event.wait(timeout=120)
        assert "best_score" in first.result
        b2.close()
    finally:
        gate.set()
        mp.undo()
