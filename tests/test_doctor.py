"""Doctor diagnosis surface: report shape, safe probing, CLI exit codes.

The probe's whole contract is that it cannot hang the caller (the axon
tunnel blocks in-process while the remote worker is down — CLAUDE.md
round-3 gotchas), so the timeout path is pinned as first-class behavior
here, not just the happy path.
"""

import json

from ndivplanning_tpu.utils.doctor import doctor_report, probe_backend


def test_report_without_probe_is_pure_introspection():
    r = doctor_report(probe=False)
    assert r["package_version"]
    assert r["jax"] and r["flax"]
    assert "backend_probe" not in r
    assert "healthy" not in r  # no probe -> no health verdict
    assert set(r["native_host_plane"]) == {"available", "lib_built"}


def test_cpu_probe_healthy():
    p = probe_backend(timeout_s=300.0, platform="cpu")
    assert p["status"] == "healthy", p
    assert p["platform"] == "cpu"
    assert p["probe_value_ok"] is True
    assert p["n_devices"] >= 1


def test_probe_timeout_is_data_not_hang():
    # An absurdly small budget forces the timeout path deterministically:
    # the probe returns structured data instead of raising or blocking.
    p = probe_backend(timeout_s=0.01)
    assert p["status"] == "timeout"
    assert "hint" in p


def test_cli_doctor_no_probe_exits_zero(capsys):
    from ndivplanning_tpu.cli import main

    rc = main(["doctor", "--no-probe"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert "backend_probe" not in report


def test_cli_doctor_cpu_probe_exits_zero(capsys):
    from ndivplanning_tpu.cli import main

    rc = main(["doctor", "--probe-cpu", "--probe-timeout", "300"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["healthy"] is True
    assert report["pallas_ndiv_mode"] in ("mosaic", "interpret")
