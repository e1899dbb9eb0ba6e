"""PlanningClient tests: the client half of the serving protocol."""

import os
import threading

import pytest

from ndivplanning_tpu.planning.client import PlanningClient, ServerError
from ndivplanning_tpu.planning.server import serve, serve_tcp
from ndivplanning_tpu.train.state import create_train_state
from ndivplanning_tpu.utils.config import get_config


def _cfg():
    return get_config("planning", batch_size=4, k=4, g_hidden=(32,),
                      d_hidden=(32,), cond_embed_dim=8, image_size=16,
                      n_candidates=32)


def test_client_tcp_plan_batch_and_errors():
    cfg = _cfg()
    state = create_train_state(cfg)
    server = serve_tcp(cfg, state, port=0)
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with PlanningClient.tcp(host, port) as c:
            resp = c.plan(start=[0.1, 0.1], goal=[0.9, 0.9],
                          obstacles=[[0.5, 0.5, 0.1]])
            assert len(resp["best_traj"]) == cfg.horizon
            out = c.plan_batch([
                {"start": [0.2, 0.2], "goal": [0.8, 0.8]},
                {"start": [0.3, 0.1], "goal": [0.7, 0.9]}])
            assert len(out) == 2 and all("best_score" in r for r in out)
            # Per-position error isolation surfaces as ServerError...
            with pytest.raises(ServerError, match="request 1"):
                c.plan_batch([{"start": [0.1, 0.1], "goal": [0.9, 0.9]},
                              {"goal": [0.9, 0.9]}])
            # ...or as raw dicts when the caller wants them.
            raw = c.plan_batch(
                [{"start": [0.1, 0.1], "goal": [0.9, 0.9]},
                 {"goal": [0.9, 0.9]}], raise_on_error=False)
            assert "best_score" in raw[0] and "error" in raw[1]
            with pytest.raises(ServerError):
                c.plan(start=[0.1], goal=[0.9, 0.9])  # bad shape
            # Connection still healthy after error replies.
            assert "best_score" in c.plan(start=[0.2, 0.1],
                                          goal=[0.9, 0.9])
        # close() is idempotent and post-close use is a clear error.
        with pytest.raises(RuntimeError, match="closed"):
            c.plan(start=[0.1, 0.1], goal=[0.9, 0.9])
    finally:
        server.shutdown()
        server.server_close()


def test_client_over_pipes_with_mpc(monkeypatch):
    """The same client drives a serve() loop over raw OS pipes (the
    spawn transport) including a closed-loop MPC request."""
    from ndivplanning_tpu.planning import server as srv

    monkeypatch.setattr(srv, "MPC_TOTAL_STEPS", 8)
    monkeypatch.setattr(srv, "MPC_REPLAN_EVERY", 4)
    monkeypatch.setattr(srv, "MPC_CANDIDATES", 8)
    cfg = _cfg()
    state = create_train_state(cfg)
    in_r, in_w = os.pipe()
    out_r, out_w = os.pipe()
    t = threading.Thread(
        target=serve, args=(cfg, state),
        kwargs={"stdin": os.fdopen(in_r, "r"),
                "stdout": os.fdopen(out_w, "w")}, daemon=True)
    t.start()
    with PlanningClient(os.fdopen(out_r, "r"), os.fdopen(in_w, "w")) as c:
        resp = c.plan(start=[0.1, 0.1], goal=[0.9, 0.9])
        assert "best_score" in resp
        ep = c.mpc(start=[0.2, 0.1], goal=[0.9, 0.8])
        assert len(ep["path"]) == 8 and ep["n_replans"] == 2
    t.join(timeout=30)  # client close() sent quit -> loop exited
    assert not t.is_alive()


def test_client_spawn_lifecycle(tmp_path):
    """spawn() owns a child process end-to-end: requests round-trip over
    its pipes and close() reaps it (stub server module — the real CLI
    would pull the whole backend into a subprocess)."""
    stub = tmp_path / "stub_cli.py"
    stub.write_text(
        "import json, sys\n"
        "assert sys.argv[1] == 'serve'\n"
        "for line in sys.stdin:\n"
        "    line = line.strip()\n"
        "    if line == 'quit':\n"
        "        break\n"
        "    req = json.loads(line)\n"
        "    print(json.dumps({'best_score': 1.0, 'echo': req}),"
        " flush=True)\n")
    c = PlanningClient.spawn(
        ["--preset", "x"], module="stub_cli",
        env=dict(os.environ, PYTHONPATH=str(tmp_path)))
    resp = c.plan(start=[0.1, 0.1], goal=[0.9, 0.9])
    assert resp["best_score"] == 1.0
    assert resp["echo"]["start"] == [0.1, 0.1]
    proc = c._owned[0]
    c.close()
    c.close()  # idempotent
    assert proc.poll() is not None  # child reaped, not leaked


def test_client_overload_retry_honors_hint():
    """Overloaded/deadline replies raise the Overloaded subclass with the
    server's retry_ms hint; plan(retries=N) sleeps the hint and resends
    (a fake pipe server scripts shed-then-ok)."""
    import io

    from ndivplanning_tpu.planning.client import Overloaded

    scripted = [
        {"error": "overloaded", "retry_ms": 1},
        {"error": "deadline_exceeded"},
        {"best_traj": [[0.1, 0.1]], "best_score": 0.5},
    ]

    class _FakeReader:
        def __init__(self, responses):
            self._resp = list(responses)

        def readline(self):
            import json as _json
            return _json.dumps(self._resp.pop(0)) + "\n"

        def close(self):
            pass

    writer = io.StringIO()
    c = PlanningClient(_FakeReader(scripted), writer)
    resp = c.plan(start=[0.1, 0.1], goal=[0.9, 0.9], retries=2)
    assert resp["best_score"] == 0.5
    # Three request lines went out (initial + two retries).
    assert writer.getvalue().count("\n") == 3

    c2 = PlanningClient(
        _FakeReader([{"error": "overloaded", "retry_ms": 7}]),
        io.StringIO())
    with pytest.raises(Overloaded) as exc:
        c2.plan(start=[0.1, 0.1], goal=[0.9, 0.9])
    assert exc.value.retry_ms == 7


def test_plan_batch_shed_raises_overloaded_with_position():
    """A shed position in a batch reply keeps its Overloaded type and
    retry_ms hint (round-4 review fix: plan_batch previously flattened
    every error to plain ServerError, making backoff impossible)."""
    import io
    import json as _json

    from ndivplanning_tpu.planning.client import Overloaded

    class _FakeReader:
        def __init__(self, responses):
            self._resp = list(responses)

        def readline(self):
            return _json.dumps(self._resp.pop(0)) + "\n"

        def close(self):
            pass

    batch_reply = [{"best_traj": [[0.1, 0.1]], "best_score": 0.5},
                   {"error": "overloaded", "retry_ms": 9}]
    c = PlanningClient(_FakeReader([batch_reply]), io.StringIO())
    with pytest.raises(Overloaded) as exc:
        c.plan_batch([{"start": [0.1, 0.1], "goal": [0.9, 0.9]},
                      {"start": [0.2, 0.2], "goal": [0.8, 0.8]}])
    assert exc.value.retry_ms == 9
    assert "request 1" in str(exc.value)

    # Non-shed errors still raise plain ServerError, position-tagged.
    bad_reply = [{"error": "bad request: no start"}]
    c2 = PlanningClient(_FakeReader([bad_reply]), io.StringIO())
    with pytest.raises(ServerError, match="request 0"):
        c2.plan_batch([{"goal": [0.9, 0.9]}])


def test_client_retry_sleeps_exact_hint(monkeypatch):
    """The server's retry_ms drain estimate is honored VERBATIM when
    present (ADVICE r4: max(hint, 50) silently overrode fast-drain hints
    below 50 ms); the 50 ms fallback applies only to replies that carry
    no hint (deadline sheds)."""
    import io

    import ndivplanning_tpu.planning.client as client_mod

    slept = []
    monkeypatch.setattr(client_mod.time, "sleep",
                        lambda s: slept.append(s))

    scripted = [
        {"error": "overloaded", "retry_ms": 10},   # hint: sleep 10 ms
        {"error": "deadline_exceeded"},            # no hint: 50 ms
        {"best_traj": [[0.1, 0.1]], "best_score": 0.5},
    ]

    class _FakeReader:
        def __init__(self, responses):
            self._resp = list(responses)

        def readline(self):
            import json as _json
            return _json.dumps(self._resp.pop(0)) + "\n"

        def close(self):
            pass

    c = PlanningClient(_FakeReader(scripted), io.StringIO())
    resp = c.plan(start=[0.1, 0.1], goal=[0.9, 0.9], retries=2)
    assert resp["best_score"] == 0.5
    assert slept == [0.010, 0.050]
