"""HTTP surface: route parity with the reference's Flask server (`mainn.py:404-700`)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from icp_slam_yolo_tpu.config import IcpConfig, MapConfig, OccupancyConfig, SlamConfig
from icp_slam_yolo_tpu.serve.app import make_server
from icp_slam_yolo_tpu.serve.state import ServerState

CFG = SlamConfig(
    map=MapConfig(width_mm=6000.0, height_mm=6000.0),
    icp=IcpConfig(max_iterations=5),
    occupancy=OccupancyConfig(window_px=60, max_ray_px=80),
    n_max=128,
    map_capacity=512,
)


@pytest.fixture()
def server(tmp_path, scan_sequence):
    state = ServerState(CFG, work_dir=str(tmp_path))
    state.feed_scan(scan_sequence[0])
    state.feed_scan(scan_sequence[1])
    srv = make_server(state, "127.0.0.1", 0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield state, f"http://127.0.0.1:{port}"
    state.stopped.set()
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:  # 4xx still carries a JSON body
        return e.code, json.loads(e.read())


def test_index_and_map_image(server):
    _, base = server
    status, body = _get(base + "/")
    assert status == 200 and b"tpu-slam" in body
    status, body = _get(base + "/map_image")
    assert status == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"


def test_poi_roundtrip(server):
    state, base = server
    status, out = _post(base + "/add_point", {})
    assert status == 200 and out["status"] == "success"
    status, body = _get(base + "/get_points_of_interest")
    pts = json.loads(body)["points"]
    assert len(pts) == 1 and "pos_px" in pts[0]
    status, out = _post(base + "/set_active_target", {"id": 0})
    assert out["status"] == "success"
    status, out = _post(base + "/set_active_target", {"id": 99})
    assert out["status"] == "error"
    status, out = _post(base + "/set_active_target", {"id": None})
    assert out["status"] == "success"


def test_save_and_reload_map(server, tmp_path):
    state, base = server
    status, _ = _get(base + "/save_map?filename=testmap.png")
    assert status == 200
    assert (tmp_path / "testmap.png").exists()
    assert (tmp_path / "testmap.npy").exists()
    pix = np.load(tmp_path / "testmap.npy")
    assert pix.dtype == np.int32 and pix.shape[1] == 2  # reference pixel format

    status, body = _get(base + "/list_saved_files")
    assert "testmap.png" in json.loads(body)["files"]

    status, body = _get(base + "/get_map_points/testmap")
    assert len(json.loads(body)["points"]) == len(pix) - 1  # reference drops last row

    status, body = _get(base + "/get_map_image/testmap.png")
    assert status == 200 and body[:4] == b"\x89PNG"

    status, body = _get(base + "/load_map/testmap.png")
    assert status == 200
    assert state.update_mode == 0  # switched to localization


def test_stream_pause_resume(server):
    state, base = server
    _get(base + "/stop_stream")
    assert state.paused.is_set()
    _get(base + "/resume_stream")
    assert not state.paused.is_set()


def test_sse_payload(server):
    state, base = server
    req = urllib.request.urlopen(base + "/points_stream", timeout=10)
    line = req.readline().decode()
    while not line.startswith("data:"):
        line = req.readline().decode()
    payload = json.loads(line[5:])
    req.close()
    assert "pose" in payload and set(payload["pose"]) == {"x", "y", "ex", "ey"}
    assert "points" in payload and isinstance(payload["points"][0], list)


def test_target_distance_tracking(server, scan_sequence):
    state, base = server
    _post(base + "/add_point", {})
    _post(base + "/set_active_target", {"id": 0})
    state.feed_scan(scan_sequence[2])
    assert state.distance_to_target is not None
    assert state.camera_trigger  # within 1 m of a POI dropped at the pose


def test_save_frame_and_toggle(server, tmp_path):
    _, base = server
    status, body = _get(base + "/save_frame")
    fname = json.loads(body)["filename"]
    assert (tmp_path / fname).exists()
    status, out = _post(base + "/toggle_visibility", {"map": False})
    assert out["show_map"] is False


def _raw_get(base, raw_path):
    """GET with the path sent verbatim (urllib normalizes ../ away)."""
    import http.client
    from urllib.parse import urlparse

    u = urlparse(base)
    conn = http.client.HTTPConnection(u.hostname, u.port, timeout=10)
    conn.request("GET", raw_path)
    r = conn.getresponse()
    status, body = r.status, r.read()
    conn.close()
    return status, body


def test_path_traversal_rejected(server, tmp_path):
    """File routes must not escape the work dir (the server is
    unauthenticated); ``../`` both raw and URL-encoded must 4xx."""
    _, base = server
    secret = tmp_path.parent / "secret.txt"
    secret.write_text("leak")
    for raw in (
        "/get_map_image/../secret.txt",
        "/get_map_image/%2e%2e/secret.txt",
        "/load_map/../secret.txt",
        "/save_map?filename=../evil",
        "/save_map?filename=sub/evil",
    ):
        status, body = _raw_get(base, raw)
        assert status in (400, 404), (raw, status)
        assert b"leak" not in body
    # npy route answers escapes with the safe empty list, never file data
    np.save(tmp_path.parent / "secret.npy", np.ones((3, 2), np.int32))
    status, body = _raw_get(base, "/get_map_points/../secret")
    assert status == 200 and json.loads(body)["points"] == []
    assert not (tmp_path.parent / "evil.png").exists()
    assert not (tmp_path / "sub").exists()


LOC_CFG = SlamConfig(
    map=MapConfig(width_mm=12000.0, height_mm=12000.0),
    icp=IcpConfig(max_iterations=10),
    occupancy=OccupancyConfig(window_px=100, max_ray_px=120),
    n_max=512,
    map_capacity=4096,
)


@pytest.fixture()
def loc_server(tmp_path, scan_sequence):
    """Server with a registration-capable config (the tiny shared CFG
    truncates scans to ~20 gated points, below the ICP floor)."""
    state = ServerState(LOC_CFG, work_dir=str(tmp_path))
    for s in scan_sequence[2:6]:  # scans 1-2 are lidar spin-up (10 gated points)
        state.feed_scan(s)
    srv = make_server(state, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield state, f"http://127.0.0.1:{port}"
    state.stopped.set()
    srv.shutdown()


def test_load_map_switches_to_real_localization(loc_server, tmp_path, scan_sequence):
    """`/load_map` must freeze the map (localization-only step) — the
    reference set update_mode=0 but kept mapping (`mainn.py:679-695` dead
    flag); here the loaded map must survive further scans while the pose
    keeps tracking.  `/resume_mapping` re-enables insertion."""
    state, base = loc_server
    status, _ = _get(base + "/save_map?filename=locmap.png")
    assert status == 200

    status, body = _get(base + "/load_map/locmap.png")
    assert status == 200
    assert state.update_mode == 0 and state.engine.cfg.localization_only

    occ_before = np.asarray(state.engine.state.occ).copy()
    map_before = np.asarray(state.engine.state.map_xy).copy()
    valid_before = np.asarray(state.engine.state.map_valid).copy()
    outs = [state.feed_scan(s) for s in scan_sequence[6:10]]
    assert any(o["accepted"] for o in outs)  # scans register against the loaded map
    assert np.array_equal(occ_before, np.asarray(state.engine.state.occ))
    assert np.array_equal(map_before, np.asarray(state.engine.state.map_xy))
    assert np.array_equal(valid_before, np.asarray(state.engine.state.map_valid))
    assert np.isfinite(state.engine.pose).all()

    status, _ = _get(base + "/resume_mapping")
    assert status == 200
    assert state.update_mode == 1 and not state.engine.cfg.localization_only
    outs = [state.feed_scan(s) for s in scan_sequence[10:14]]
    assert any(o["accepted"] for o in outs)
    assert not np.array_equal(occ_before, np.asarray(state.engine.state.occ))


def test_load_pcd_map_before_any_scan(tmp_path, scan_sequence):
    """Loading a PCD with a fresh engine (no scans fed) must build a usable
    localization state rather than silently no-op."""
    from icp_slam_yolo_tpu.io import maps as maps_io
    from icp_slam_yolo_tpu.reference_impl.oracle import polar_gate

    pts = polar_gate(np.asarray(scan_sequence[2], float), LOC_CFG.gate)
    pcd = tmp_path / "seed.pcd"
    maps_io.save_pcd(pts, str(pcd))

    state = ServerState(LOC_CFG, work_dir=str(tmp_path))
    state.load_map(str(pcd))
    assert state.engine.cfg.localization_only
    n_valid = int(np.asarray(state.engine.state.map_valid).sum())
    assert n_valid == len(pts)
    out = state.feed_scan(scan_sequence[3])
    assert np.isfinite(out["rmse"])


def test_deep_zoom_tiles(server):
    """`/map_viewer` + the tiled-pyramid contract (`/map_tiles_meta`,
    `/map_tiles`) — the reference UI's OpenSeadragon deep zoom
    (`templates/jjj.html:9,150`) served dependency-free.  Tiles must be
    valid PNGs, level-0 must contain the whole (painted) map, and
    out-of-range / malformed coords must 400."""
    import io

    from PIL import Image

    _, base = server
    code, body = _get(base + "/map_viewer")
    assert code == 200 and b"map_tiles_meta" in body

    code, body = _get(base + "/map_tiles_meta")
    meta = json.loads(body)
    assert code == 200
    assert meta["width"] == CFG.map.width_px and meta["height"] == CFG.map.height_px
    assert meta["tile"] == 256 and meta["zmax"] >= 0

    # the native-level tile must BE the corresponding crop of /map_image
    # (same rendering, tiled) with unknown-gray padding beyond the map edge
    code, body = _get(base + f"/map_tiles?z={meta['zmax']}&x=0&y=0")
    tile = np.asarray(Image.open(io.BytesIO(body)))
    assert code == 200 and tile.shape == (256, 256)
    _, full_png = _get(base + "/map_image")
    full = np.asarray(Image.open(io.BytesIO(full_png)))
    h = min(256, full.shape[0])
    w = min(256, full.shape[1])
    assert np.array_equal(tile[:h, :w], full[:h, :w])
    assert (tile[h:, :] == 127).all() and (tile[:, w:] == 127).all()

    # beyond-the-map tile is all-unknown gray, not an error
    code, body = _get(base + f"/map_tiles?z=0&x=3&y=3")
    img = np.asarray(Image.open(io.BytesIO(body)))
    assert code == 200 and (img == 127).all()

    # malformed / out-of-range coords
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        _get(base + "/map_tiles?z=abc&x=0&y=0")
    with pytest.raises(urllib.error.HTTPError):
        _get(base + "/map_tiles?z=99&x=9999&y=0")
