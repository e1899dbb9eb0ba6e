"""Planning server tests (serving path)."""

import io
import json

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
