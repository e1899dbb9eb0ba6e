"""CLI smoke tests (C12)."""

import json

import pytest

from ndivplanning_tpu.cli import main


def test_train_and_eval_roundtrip(tmp_path, capsys):
    rc = main([
        "train", "--preset", "pointmass2d", "--steps", "6",
        "--batch-size", "8", "--k", "4", "--workdir", str(tmp_path),
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["final_step"] == 6

    rc = main(["eval", "--preset", "pointmass2d", "--batch-size", "8",
               "--k", "4", "--workdir", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "eval_success_rate" in out


def test_plan_command(tmp_path, capsys):
    rc = main(["plan", "--preset", "pointmass2d", "--batch-size", "4",
               "--k", "4", "--workdir", str(tmp_path)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_candidates"] == 1000


def test_plan_sharded_matches_unsharded(tmp_path, capsys):
    # `plan --sharded` over the 8-virtual-device mesh must report the
    # same plan as the unsharded path (same program + constraints).
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    common = ["plan", "--preset", "pointmass2d", "--batch-size", "4",
              "--k", "4", "--workdir", str(tmp_path),
              "--set", "n_candidates=64"]
    rc = main(common)
    assert rc == 0
    want = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    rc = main(common + ["--sharded", "--set", "dp_shards=4",
                        "--set", "div_shards=2"])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["mesh"] == "4x2"
    assert got["best_score"] == pytest.approx(want["best_score"], rel=1e-5)
    assert got["best_reached"] == want["best_reached"]


def test_plan_sharded_refine_matches_unsharded(tmp_path, capsys):
    # `plan --sharded --refine X` routes through the candidate-sharded
    # refiner factories (round 4 — previously rejected) and must report
    # the same plan as the unsharded refiner.
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    common = ["plan", "--preset", "pointmass2d", "--batch-size", "4",
              "--k", "4", "--workdir", str(tmp_path),
              "--set", "n_candidates=64", "--set", "cem_iters=2",
              "--refine", "cem"]
    rc = main(common)
    assert rc == 0
    want = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    rc = main(common + ["--sharded", "--set", "dp_shards=4",
                        "--set", "div_shards=2"])
    assert rc == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["mesh"] == "4x2"
    assert got["best_score"] == pytest.approx(want["best_score"], rel=1e-5)
    assert got["best_curve"] == pytest.approx(want["best_curve"], rel=1e-5)


def test_plan_refine_cem(tmp_path, capsys):
    rc = main(["plan", "--preset", "pointmass2d", "--batch-size", "4",
               "--k", "4", "--workdir", str(tmp_path), "--refine", "cem",
               "--set", "n_candidates=64", "--set", "cem_iters=3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["best_curve"]) == 3
    # Monotone best-so-far, and the reported best never loses to it.
    curve = out["best_curve"]
    assert all(b <= a + 1e-6 for a, b in zip(curve, curve[1:]))
    assert out["best_score"] <= curve[-1] + 1e-6


def test_plan_refine_grad(tmp_path, capsys):
    rc = main(["plan", "--preset", "pointmass2d", "--batch-size", "4",
               "--k", "4", "--workdir", str(tmp_path), "--refine", "grad",
               "--set", "n_candidates=32", "--set", "grad_refine_steps=4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["soft_loss_curve"]) == 4
    # Union of prior + refined candidates is what gets hard-scored.
    assert out["n_candidates"] == 2 * (32 // 4)


def test_plan_refine_trajopt(tmp_path, capsys):
    rc = main(["plan", "--preset", "pointmass2d", "--batch-size", "4",
               "--k", "4", "--workdir", str(tmp_path), "--refine",
               "trajopt", "--set", "n_candidates=32",
               "--set", "trajopt_steps=4"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["soft_loss_curve"]) == 4
    # Union of warm-start + optimised candidates is what gets hard-scored.
    assert out["n_candidates"] == 2 * (32 // 4)


def test_viz_command(tmp_path, capsys):
    pytest.importorskip("matplotlib")
    out = tmp_path / "plan.png"
    rc = main(["viz", "--preset", "pointmass2d", "--batch-size", "4",
               "--k", "4", "--workdir", str(tmp_path), "--out", str(out)])
    assert rc == 0
    assert out.exists() and out.stat().st_size > 1000
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["out"] == str(out)


def test_bad_preset_raises():
    with pytest.raises(ValueError):
        main(["train", "--preset", "bogus"])


def test_plan_mpc_batched_episodes(tmp_path, capsys):
    rc = main(["plan", "--preset", "pointmass2d", "--batch-size", "4",
               "--k", "4", "--workdir", str(tmp_path), "--mpc",
               "--mpc-episodes", "2", "--mpc-steps", "8",
               "--mpc-replan", "4", "--mpc-candidates", "8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["episodes"] == 2
    assert out["n_replans"] == 2
    assert 0.0 <= out["success_rate"] <= 1.0
    assert 0.0 <= out["collision_rate"] <= 1.0
    assert out["episodes_per_sec"] > 0


def test_plan_mpc_single_episode_reports_final_pos(tmp_path, capsys):
    rc = main(["plan", "--preset", "pointmass2d", "--batch-size", "4",
               "--k", "4", "--workdir", str(tmp_path), "--mpc",
               "--mpc-steps", "8", "--mpc-replan", "8",
               "--mpc-candidates", "8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["final_pos"]) == 2


def test_eval_dataset(tmp_path, capsys):
    """`eval --dataset` evaluates against a recorded dataset's TRUE
    scenes (honest held-out protocol from the CLI)."""
    ds_path = str(tmp_path / "ds.npz")
    rc = main(["record-data", "--preset", "pointmass2d", "--batch-size",
               "8", "--k", "4", "--out", ds_path, "--n-examples", "64"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["eval", "--preset", "pointmass2d", "--batch-size", "8",
               "--k", "4", "--workdir", "", "--dataset", ds_path,
               "--suite-size", "32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "eval_success_rate" in out and "eval_collision_rate" in out


def test_eval_mpc_closed_loop_suite(tmp_path, capsys):
    """`eval --mpc` reports frozen-suite closed-loop quality."""
    rc = main(["eval", "--preset", "pointmass2d", "--batch-size", "8",
               "--k", "4", "--workdir", str(tmp_path),
               "--suite-size", "4", "--mpc", "--mpc-steps", "8",
               "--mpc-replan", "4", "--mpc-candidates", "8",
               "--set", "g_hidden=32", "--set", "d_hidden=32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "eval_mpc_success_rate" in out
    assert 0.0 <= out["eval_mpc_success_rate"] <= 1.0
    assert out["eval_mpc_replan_every"] == 4.0


def test_eval_planner_open_loop_ladder(tmp_path, capsys):
    """`eval --planner X` reports frozen-suite open-loop planner quality
    (the suite-scale ladder as a first-class protocol, round 4)."""
    common = ["eval", "--preset", "pointmass2d", "--batch-size", "8",
              "--k", "4", "--workdir", str(tmp_path),
              "--suite-size", "4", "--set", "g_hidden=32",
              "--set", "d_hidden=32", "--set", "n_candidates=32",
              "--set", "trajopt_steps=2", "--scene-chunk", "2"]
    rc = main(common + ["--planner", "oneshot"])
    assert rc == 0
    one = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert one["eval_planner"] == "oneshot"
    assert one["eval_plan_n_scenes"] == 4.0

    rc = main(common + ["--planner", "trajopt"])
    assert rc == 0
    trj = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # The refiner's union selection can only improve on its own warm
    # starts, but those are a DIFFERENT (smaller) candidate draw than
    # the one-shot's — so only sanity-bound the outputs.
    assert 0.0 <= trj["eval_plan_reach_rate"] <= 1.0
    assert "eval_plan_best_score" in trj


def test_serve_tcp_cli_end_to_end(tmp_path):
    """The full `serve --tcp` CLI path in a subprocess: readiness line
    on stdout, TCP round-trips from concurrent clients (cross-batch),
    and a SIGINT shutdown whose final {"served": N} count includes
    in-flight connections (the daemon-handler join race, round 3)."""
    import os
    import signal
    import socket
    import subprocess
    import sys
    import threading

    wrapper = tmp_path / "clirun.py"
    wrapper.write_text(
        "import sys, jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from ndivplanning_tpu.cli import main\n"
        "sys.exit(main(sys.argv[1:]))\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, str(wrapper), "serve", "--preset", "pointmass2d",
         "--batch-size", "4", "--k", "4", "--workdir", str(tmp_path),
         "--set", "n_candidates=32", "--tcp", "0", "--cross-batch"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=dict(os.environ, PYTHONPATH=repo))
    try:
        ready = json.loads(proc.stdout.readline())
        host, port = ready["listening"].rsplit(":", 1)
        results = {}

        def client(i):
            with socket.create_connection((host, int(port)),
                                          timeout=300) as s:
                s.sendall((json.dumps(
                    {"start": [0.1 + 0.1 * i, 0.1],
                     "goal": [0.9, 0.9]}) + "\nquit\n").encode())
                results[i] = json.loads(s.makefile("r").readline())

        client(0)  # pays the bucket-1 compile
        threads = [threading.Thread(target=client, args=(i,))
                   for i in (1, 2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all("best_score" in results[i] for i in range(3)), results
        proc.send_signal(signal.SIGINT)
        out, _ = proc.communicate(timeout=60)
        assert json.loads(out.strip().splitlines()[-1]) == {"served": 3}
    finally:
        if proc.poll() is None:
            proc.kill()


def test_viz_mpc_and_curves(tmp_path, capsys):
    pytest.importorskip("matplotlib")
    wd = str(tmp_path / "run")
    rc = main(["train", "--preset", "pointmass2d", "--batch-size", "8",
               "--k", "4", "--steps", "60", "--set", "eval_every=30",
               "--workdir", wd])
    assert rc == 0
    capsys.readouterr()
    png = str(tmp_path / "ep.png")
    rc = main(["viz", "--workdir", wd, "--out", png, "--mpc",
               "--mpc-steps", "8", "--mpc-replan", "4",
               "--mpc-candidates", "8"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["out"] == png and out["n_replans"] == 2
    import os
    assert os.path.exists(png)
    curves = str(tmp_path / "curves.png")
    rc = main(["curves", "--workdir", wd, "--out", curves])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["train_rows"] > 0 and os.path.exists(curves)
    # missing metrics.jsonl is a clean usage error, not a traceback
    rc = main(["curves", "--workdir", str(tmp_path / "nope"),
               "--out", curves])
    assert rc == 2


def test_distill_seed_varies_record_seed(tmp_path):
    """`distill --seed N` must vary the expert-recording scene draw
    (recorded in record.json) while staying disjoint from the frozen
    eval suite's seed; without --seed the canonical RECORD_SEED is
    used (cli.py distill dispatch)."""
    from ndivplanning_tpu.train.distill import RECORD_SEED

    rc = main([
        "train", "--preset", "pointmass2d", "--steps", "6",
        "--batch-size", "8", "--k", "4", "--workdir", str(tmp_path),
    ])
    assert rc == 0
    seen = {}
    for seed_args, tag in (([], "default"), (["--seed", "3"], "s3")):
        dw = tmp_path / f"distill_{tag}"
        rc = main([
            "distill", "--workdir", str(tmp_path),
            "--distill-workdir", str(dw),
            "--rounds", "1", "--scenes-per-round", "8", "--epochs", "1",
            "--suite-size", "8", "--planner", "trajopt",
            *seed_args,
        ])
        assert rc == 0
        rec = json.loads((dw / "round_0" / "record.json").read_text())
        seen[tag] = rec["seed"]
    assert seen["default"] == RECORD_SEED
    assert seen["s3"] == RECORD_SEED + 7919 * 3
