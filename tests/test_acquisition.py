"""Acquisition layer: replay backend, scanner thread, reconnect, recorder."""

import os
import time

import numpy as np
import pytest

from icp_slam_yolo_tpu.acquisition import LidarScanner, ReplayLidar, ScanRecorder
from icp_slam_yolo_tpu.acquisition.lidar import LidarBackend


@pytest.fixture()
def scan_dir(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(1, 6):
        np.save(tmp_path / f"Scan_data_{i}.npy", rng.uniform(0, 9000, (50, 3)))
    return str(tmp_path)


def test_replay_scanner(scan_dir):
    scanner = LidarScanner(ReplayLidar(scan_dir, rate_hz=200.0))
    scanner.connect()
    scanner.start()
    deadline = time.time() + 3
    scan = None
    while scan is None and time.time() < deadline:
        scan = scanner.get_scan()
        time.sleep(0.01)
    scanner.stop()
    assert scan is not None and scan.shape == (50, 3)
    assert scanner.scan_count >= 1


def test_scanner_reconnects_on_failure(scan_dir):
    class Flaky(LidarBackend):
        def __init__(self):
            self.connects = 0

        def connect(self):
            self.connects += 1

        def disconnect(self):
            pass

        def iter_scans(self):
            yield np.zeros((20, 3))
            raise IOError("serial glitch")

    backend = Flaky()
    scanner = LidarScanner(backend)
    scanner.connect()
    scanner.start()
    time.sleep(0.5)
    scanner.stop()
    assert scanner.reconnects >= 1
    assert backend.connects >= 2  # initial + at least one reconnect


def test_connect_retries():
    class Dead(LidarBackend):
        def __init__(self):
            self.attempts = 0

        def connect(self):
            self.attempts += 1
            raise IOError("no port")

    import icp_slam_yolo_tpu.acquisition.lidar as mod

    old = mod.RETRY_DELAY_S
    mod.RETRY_DELAY_S = 0.01
    try:
        backend = Dead()
        scanner = LidarScanner(backend)
        with pytest.raises(ConnectionError):
            scanner.connect()
        assert backend.attempts == 5  # CONNECT_RETRIES (`b.py:56-95`)
    finally:
        mod.RETRY_DELAY_S = old


def test_recorder(tmp_path):
    rec = ScanRecorder(str(tmp_path / "rec"), interval_s=0.0)
    p1 = rec.maybe_save(np.zeros((10, 3)))
    p2 = rec.maybe_save(np.ones((12, 3)))
    assert p1.endswith("Scan_data_1.npy") and p2.endswith("Scan_data_2.npy")
    assert np.load(p2).shape == (12, 3)
    assert rec.maybe_save(None) is None


def test_recorder_interval(tmp_path):
    rec = ScanRecorder(str(tmp_path), interval_s=10.0)
    assert rec.maybe_save(np.zeros((5, 3))) is not None
    assert rec.maybe_save(np.zeros((5, 3))) is None  # too soon


def test_stage_timer():
    from icp_slam_yolo_tpu.utils.profiling import StageTimer

    t = StageTimer(sync=False)
    with t("stage_a"):
        time.sleep(0.01)
    t.measure("stage_b", lambda: sum(range(1000)))
    rep = t.report()
    assert rep["stage_a"]["count"] == 1 and rep["stage_a"]["total_s"] > 0.005
    assert "stage_b" in t.summary()
