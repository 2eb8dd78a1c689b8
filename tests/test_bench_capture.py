"""The driver-capture script's wedged-backend resilience.

Round 1's capture died on one transient tunnel failure (VERDICT item 1);
round 2 added subprocess isolation + retries + a banked-capture fallback for
a wedged TPU lease. These tests pin the pure-python orchestration logic —
the measurement paths themselves are exercised on hardware by the driver.
"""
import importlib.util
import json
import os

import pytest

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # Point the banked-capture path into the sandbox.
    monkeypatch.setattr(mod, "_CAPTURE_PATH", str(tmp_path / "capture.json"))
    return mod


def test_no_banked_capture_returns_false(bench):
    assert bench._emit_banked_capture("reason") is False


def test_banked_capture_requires_a_value(bench):
    with open(bench._CAPTURE_PATH, "w") as f:
        json.dump({"metric": "m", "value": None}, f)
    assert bench._emit_banked_capture("reason") is False


def test_banked_capture_emitted_with_provenance(bench, capsys):
    banked = {
        "metric": "pm_vqvae_celeba_train_steps_per_sec_per_chip",
        "value": 59.2,
        "unit": "steps/sec",
        "vs_baseline": 2.4,
        "measured_at": "2026-08-17T12:00:00Z",
    }
    with open(bench._CAPTURE_PATH, "w") as f:
        json.dump(banked, f)
    assert bench._emit_banked_capture("backend unreachable") is True
    rec = json.loads(capsys.readouterr().out.strip())
    # The fallback must be loud about being a cached (but real) measurement.
    assert rec["cached"] is True
    assert rec["cache_reason"] == "backend unreachable"
    assert rec["value"] == 59.2
    assert rec["measured_at"] == banked["measured_at"]


def test_corrupt_banked_capture_is_ignored(bench):
    with open(bench._CAPTURE_PATH, "w") as f:
        f.write("{not json")
    assert bench._emit_banked_capture("reason") is False


def test_probe_backend_handles_spawn_failure(bench, monkeypatch):
    # A probe that cannot even spawn must read as "not grantable", never raise.
    import subprocess

    def boom(*a, **k):
        raise OSError("no fork")

    monkeypatch.setattr(subprocess, "run", boom)
    assert bench._probe_backend() is False
