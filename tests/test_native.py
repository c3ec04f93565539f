"""Native C++ components: comm link loopback + handshake, batched scan loader."""

import os
import time

import numpy as np
import pytest

from icp_slam_yolo_tpu.native.build import library_available

pytestmark = pytest.mark.skipif(not library_available(), reason="g++ unavailable")


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_robotlink_telemetry_and_commands():
    from icp_slam_yolo_tpu.native.robotlink import RobotLinkClient, RobotLinkServer

    port = _free_port()
    with RobotLinkServer(port) as server:
        with RobotLinkClient("127.0.0.1", port) as client:
            deadline = time.time() + 2
            while server.client_count < 1 and time.time() < deadline:
                time.sleep(0.01)
            assert server.client_count == 1

            # telemetry out (AP -> station)
            assert server.broadcast("pose:1.0,2.0,0.5") == 1
            assert client.read_line(2000) == "pose:1.0,2.0,0.5"

            # command in (station -> AP)
            client.send("CMD:forward")
            deadline = time.time() + 2
            cmd = None
            while cmd is None and time.time() < deadline:
                cmd = server.read_command()
                time.sleep(0.01)
            assert cmd == "CMD:forward"


def test_robotlink_handshake_echo():
    """The firmware's send/echo-verify protocol (`ESP_AP/src/main.cpp:34-92`)."""
    import threading

    from icp_slam_yolo_tpu.native.robotlink import RobotLinkClient, RobotLinkServer

    port = _free_port()
    with RobotLinkServer(port) as server:
        stop = threading.Event()

        def echo_loop():  # the AP-side UART echo partner
            while not stop.is_set():
                line = server.read_command()
                if line is not None:
                    server.broadcast(line)
                time.sleep(0.005)

        t = threading.Thread(target=echo_loop, daemon=True)
        t.start()
        with RobotLinkClient("127.0.0.1", port) as client:
            retries = client.handshake("DX:0")
            assert retries == 0
        stop.set()


def test_robotlink_max_two_clients():
    from icp_slam_yolo_tpu.native.robotlink import RobotLinkClient, RobotLinkServer

    port = _free_port()
    with RobotLinkServer(port) as server:
        c1 = RobotLinkClient("127.0.0.1", port)
        c2 = RobotLinkClient("127.0.0.1", port)
        time.sleep(0.3)
        assert server.client_count == 2
        c3 = RobotLinkClient("127.0.0.1", port)  # connects at TCP level...
        time.sleep(0.3)
        assert server.client_count == 2  # ...but the hub refuses a third slot
        assert server.broadcast("x") == 2
        for c in (c1, c2, c3):
            c.close()


def test_handshake_timeout():
    from icp_slam_yolo_tpu.native.robotlink import RobotLinkClient, RobotLinkServer

    port = _free_port()
    with RobotLinkServer(port) as server:  # nobody echoes
        with RobotLinkClient("127.0.0.1", port) as client:
            t0 = time.time()
            with pytest.raises(TimeoutError):
                client.handshake("DX:0")
            # 3 attempts x 1 s timeout (`RETRY_LIMIT=2`)
            assert 2.5 < time.time() - t0 < 6.0


def test_scanloader_matches_python(tmp_path):
    from icp_slam_yolo_tpu.io import scans as scans_io
    from icp_slam_yolo_tpu.native.scanloader import load_batch_native

    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        n = int(rng.integers(10, 400))
        arr = rng.uniform(0, 9000, (n, 3))
        p = str(tmp_path / f"scan_{i}.npy")
        np.save(p, arr)
        paths.append(p)
    paths.append(str(tmp_path / "missing.npy"))

    out, counts = load_batch_native(paths, 512)
    assert out.shape == (6, 512, 3)
    assert counts[-1] == -1  # missing file flagged, batch still loads
    for i, p in enumerate(paths[:-1]):
        ref = scans_io.pad_scan(scans_io.load_scan(p), 512)
        np.testing.assert_allclose(out[i], ref, rtol=1e-6)
        assert counts[i] == len(np.load(p))


def test_scanloader_on_reference_data():
    if not os.path.isdir("/root/reference/Scan_data_1"):
        pytest.skip("reference data unavailable")
    from icp_slam_yolo_tpu.io import scans as scans_io
    from icp_slam_yolo_tpu.native.scanloader import load_batch_native

    paths = scans_io.sequence_paths("/root/reference/Scan_data_1", 1, 101)
    t0 = time.time()
    out, counts = load_batch_native(paths, 512)
    native_dt = time.time() - t0
    t0 = time.time()
    ref, ref_counts, _ = scans_io.load_sequence("/root/reference/Scan_data_1", 1, 101)
    py_dt = time.time() - t0
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    np.testing.assert_array_equal(counts, ref_counts)
    print(f"native {native_dt*1e3:.0f} ms vs python {py_dt*1e3:.0f} ms for 100 scans")


def test_esp32_firmware_syntax():
    """The flashable PlatformIO firmware sources (`native/esp32/*`) must
    compile against the host-check Arduino API stubs — catches real C++
    errors without the espressif32 toolchain (the protocol behavior itself
    is covered by the robotlink tests above)."""
    import subprocess

    root = os.path.join(os.path.dirname(__file__), "..", "native", "esp32")
    stubs = os.path.join(root, "hostcheck")
    for proj in ("esp_ap", "esp_host2", "esp_uart"):
        src = os.path.join(root, proj, "src", "main.cpp")
        assert os.path.exists(src), src
        res = subprocess.run(
            ["g++", "-std=c++17", "-fsyntax-only", "-I", stubs, src],
            capture_output=True, text=True,
        )
        assert res.returncode == 0, f"{proj}: {res.stderr}"
