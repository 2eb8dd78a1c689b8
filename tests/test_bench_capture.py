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
    # Point the banked-capture and reference paths into the sandbox.
    monkeypatch.setattr(mod, "_CAPTURE_PATH", str(tmp_path / "capture.json"))
    monkeypatch.setattr(mod, "_REFERENCE_PATH", str(tmp_path / "ref.json"))
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


def test_banked_capture_merges_reference_ratio(bench, capsys):
    """A banked capture that predates the on-chip reference measurement
    still reports vs_reference_impl: the ratio is merged at emit time from
    BENCH_REFERENCE.json (accelerator records only — CPU runs are not
    comparable to a TPU capture)."""
    with open(bench._CAPTURE_PATH, "w") as f:
        json.dump({"metric": "m", "value": 60.0, "unit": "steps/sec"}, f)
    with open(bench._REFERENCE_PATH, "w") as f:
        json.dump(
            [
                {"value": 99.0, "platform": "cpu"},  # must be ignored
                {"value": 20.0, "platform": "tpu"},
                {"value": 15.0, "platform": "tpu"},  # max() wins above
            ],
            f,
        )
    assert bench._emit_banked_capture("backend unreachable") is True
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["reference_impl_steps_per_sec"] == 20.0
    assert rec["vs_reference_impl"] == 3.0


def test_banked_capture_keeps_existing_reference_ratio(bench, capsys):
    # A capture banked by a fresh main() already carries the ratio; the
    # fallback must not overwrite it with a possibly newer reference file.
    with open(bench._CAPTURE_PATH, "w") as f:
        json.dump({"metric": "m", "value": 60.0, "vs_reference_impl": 3.2}, f)
    with open(bench._REFERENCE_PATH, "w") as f:
        json.dump([{"value": 10.0, "platform": "tpu"}], f)
    assert bench._emit_banked_capture("reason") is True
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["vs_reference_impl"] == 3.2


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


def test_probe_backend_retries_one_hang(bench, monkeypatch):
    # A transiently-held lease (another process finishing a long compile)
    # hangs the first probe and releases before the retry; the probe must
    # NOT declare the backend wedged (observed 2026-08-20).
    outcomes = iter([(False, "hang"), (True, None)])
    monkeypatch.setattr(
        bench, "_probe_backend_once", lambda *a, **k: next(outcomes)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._probe_backend() is True


def test_probe_backend_two_hangs_is_wedged(bench, monkeypatch):
    # A true wedge hangs the retry too — give up (each hang already costs a
    # full probe timeout; re-entering the claim queue forever would burn the
    # whole capture budget).
    monkeypatch.setattr(
        bench, "_probe_backend_once", lambda *a, **k: (False, "hang")
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._probe_backend() is False


def test_baseline_clamped_up_to_recorded_best(bench):
    """Relay-latency noise slows the host baseline 2x between sessions on
    identical code; vs_baseline must only ever UNDERSTATE the win."""
    slow = bench.RECORDED_HOST_STEPS_PER_SEC / 2
    naive, src = bench._resolve_baseline(slow)
    assert naive == bench.RECORDED_HOST_STEPS_PER_SEC
    assert src == "measured_clamped_to_recorded_best"


def test_baseline_live_measurement_wins_when_faster(bench):
    fast = bench.RECORDED_HOST_STEPS_PER_SEC * 1.5
    naive, src = bench._resolve_baseline(fast)
    assert naive == fast
    assert src == "measured"


def test_baseline_falls_back_to_recorded_when_unmeasured(bench):
    naive, src = bench._resolve_baseline(None)
    assert naive == bench.RECORDED_HOST_STEPS_PER_SEC
    assert src == "recorded_round1"
