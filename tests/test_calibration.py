"""Dispatch-calibration fingerprint staleness + auto-recalibration
(VERDICT r3 #9: the crossover is a measurement of one host+chip+link
pair; a fresh host must detect the mismatch and re-measure unaided)."""
import json

import pytest

from seeksv_tpu.align.engine import BatchAligner


class _FakeDev:
    platform = "tpu"

    def __str__(self):
        return "TPU v5 lite0"


@pytest.fixture
def fake_tpu(monkeypatch):
    import jax
    monkeypatch.setattr(jax, "devices", lambda: [_FakeDev()])
    yield
    BatchAligner._load_calibration.cache_clear()


def _write(p, fingerprint):
    p.write_text(json.dumps({"crossover_cells": 123,
                             "fingerprint": fingerprint}))
    BatchAligner._load_calibration.cache_clear()


def test_stale_on_device_mismatch(tmp_path, monkeypatch, fake_tpu):
    p = tmp_path / "cal.json"
    monkeypatch.setenv("SEEKSV_TPU_DISPATCH_CALIB", str(p))
    _write(p, {"device": "TPU v99 mega9", "platform": "tpu",
               "upload_probe_mb_s": None})
    reason = BatchAligner.calibration_stale()
    assert reason is not None and "TPU v99" in reason


def test_fresh_fingerprint_not_stale_and_crossover_loaded(
        tmp_path, monkeypatch, fake_tpu):
    p = tmp_path / "cal.json"
    monkeypatch.setenv("SEEKSV_TPU_DISPATCH_CALIB", str(p))
    _write(p, {"device": "TPU v5 lite0", "platform": "tpu",
               "upload_probe_mb_s": None})
    assert BatchAligner.calibration_stale() is None
    assert BatchAligner._calibrated_min_device_cells() == 123


def test_missing_fingerprint_is_stale(tmp_path, monkeypatch, fake_tpu):
    p = tmp_path / "cal.json"
    monkeypatch.setenv("SEEKSV_TPU_DISPATCH_CALIB", str(p))
    p.write_text(json.dumps({"crossover_cells": 123}))
    BatchAligner._load_calibration.cache_clear()
    assert "fingerprint" in BatchAligner.calibration_stale()


def test_ensure_calibration_reruns_script(tmp_path, monkeypatch, fake_tpu):
    p = tmp_path / "cal.json"
    monkeypatch.setenv("SEEKSV_TPU_DISPATCH_CALIB", str(p))
    _write(p, {"device": "TPU v99 mega9", "platform": "tpu",
               "upload_probe_mb_s": None})
    calls = []

    def fake_run(cmd, timeout):
        calls.append(cmd)
        # the "recalibration" writes a now-matching artifact
        _write(p, {"device": "TPU v5 lite0", "platform": "tpu",
                   "upload_probe_mb_s": None})

        class _Proc:
            returncode = 0
        return _Proc()

    import subprocess
    monkeypatch.setattr(subprocess, "run", fake_run)
    logs = []
    assert BatchAligner.ensure_calibration(auto=True, log=logs.append)
    assert calls and calls[0][-1] == str(p)
    assert any("calibrate_dispatch.py" in c for c in calls[0])
    # second call: fingerprint now matches -> no rerun
    assert not BatchAligner.ensure_calibration(auto=True, log=logs.append)


def test_ensure_calibration_timeout_falls_back(tmp_path, monkeypatch,
                                               fake_tpu):
    # A wedged backend must not block the pipeline: the recalibration
    # subprocess is bounded and a timeout keeps the committed values
    # (ADVICE r4).
    p = tmp_path / "cal.json"
    monkeypatch.setenv("SEEKSV_TPU_DISPATCH_CALIB", str(p))
    _write(p, {"device": "TPU v99 mega9", "platform": "tpu",
               "upload_probe_mb_s": None})
    import subprocess

    def fake_run(cmd, timeout):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    logs = []
    assert not BatchAligner.ensure_calibration(auto=True, log=logs.append)
    assert any("timed out" in str(m) for m in logs)
    BatchAligner._load_calibration.cache_clear()


def test_no_accel_never_stale(tmp_path, monkeypatch):
    # CPU-only jax: host path serves everything; nothing to recalibrate
    import jax

    class _Cpu:
        platform = "cpu"

        def __str__(self):
            return "TFRT_CPU_0"

    monkeypatch.setattr(jax, "devices", lambda: [_Cpu()])
    p = tmp_path / "cal.json"
    monkeypatch.setenv("SEEKSV_TPU_DISPATCH_CALIB", str(p))
    _write(p, {"device": "TPU v99 mega9", "platform": "tpu",
               "upload_probe_mb_s": None})
    assert BatchAligner.calibration_stale() is None
    BatchAligner._load_calibration.cache_clear()
