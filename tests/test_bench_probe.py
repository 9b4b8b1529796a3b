"""bench.py backend probe: outage guard for the driver's round-end run.

The tunneled TPU runtime can block indefinitely during device init (observed
multi-hour outages); bench.py probes in a subprocess with a timeout and emits
an honest error JSON line instead of hanging. These tests cover the probe's
decision logic without touching any backend (subprocess.run is stubbed).
"""

import subprocess

import bench


def test_probe_skipped_when_cpu_pinned(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    # Must not even attempt a subprocess (would hang on a dead tunnel).
    monkeypatch.setattr(
        bench.subprocess,
        "run",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("probed")),
    )
    assert bench._probe_backend(timeout_s=1) is None


def test_probe_runs_under_axon_env(monkeypatch):
    # The production environment pins JAX_PLATFORMS=axon; that must NOT
    # short-circuit the probe (regression: the first guard skipped on any
    # non-empty JAX_PLATFORMS and bench hung on the dead tunnel).
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    calls = []

    def fake_run(cmd, timeout, capture_output, text):
        calls.append(cmd)
        raise subprocess.TimeoutExpired(cmd=cmd, timeout=timeout)

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    err = bench._probe_backend(timeout_s=7)
    assert calls, "probe subprocess was not launched"
    assert err is not None and "timed out after 7s" in err


def test_probe_reports_backend_failure(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class R:
        returncode = 1
        stderr = "Traceback...\nRuntimeError: Unable to initialize backend 'axon': UNAVAILABLE"

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: R())
    err = bench._probe_backend(timeout_s=7)
    assert err is not None
    assert "backend unavailable" in err
    assert "UNAVAILABLE" in err


def test_probe_ok(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    class R:
        returncode = 0
        stderr = ""

    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: R())
    assert bench._probe_backend(timeout_s=7) is None
