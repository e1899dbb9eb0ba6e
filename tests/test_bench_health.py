"""bench.py health gate: the driver's bench run must survive a TPU
worker outage window (wait-loop) and must never wait forever (budget).
Probes are monkeypatched — no device involved."""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


class _FakeCompleted:
    def __init__(self, rc):
        self.returncode = rc


def test_health_wait_returns_on_first_healthy(monkeypatch):
    calls = []

    def fake_run(*a, **kw):
        calls.append(1)
        return _FakeCompleted(0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    bench._wait_for_healthy_backend(max_wait_s=60)
    assert len(calls) == 1


def test_health_wait_recovers_after_failures(monkeypatch):
    calls = []

    def fake_run(*a, **kw):
        calls.append(1)
        return _FakeCompleted(0 if len(calls) >= 3 else 1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._wait_for_healthy_backend(max_wait_s=3600)
    assert len(calls) == 3


def test_health_wait_budget_exhaustion_proceeds(monkeypatch):
    """On a persistent outage the gate gives up at the budget (the real
    run then fails loudly) instead of blocking the driver forever."""
    calls = []

    def fake_run(*a, **kw):
        calls.append(1)
        raise subprocess.TimeoutExpired(cmd="probe", timeout=240)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    t = {"now": 0.0}

    def fake_monotonic():
        t["now"] += 100.0
        return t["now"]

    monkeypatch.setattr(bench.time, "monotonic", fake_monotonic)
    bench._wait_for_healthy_backend(max_wait_s=500)  # must return
    assert calls  # probed at least once before giving up
