"""Localization-only mode and full SLAM state checkpoint/resume."""

import numpy as np
import pytest
import jax.numpy as jnp

from icp_slam_yolo_tpu.config import SlamConfig
from icp_slam_yolo_tpu.io import scans as scans_io
from icp_slam_yolo_tpu.slam import pipeline
from icp_slam_yolo_tpu.slam.api import Slam

CFG = SlamConfig(map_capacity=4096)


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_localization_tracks_without_map_update(scan_sequence):
    raw = scan_sequence[:25]
    padded = scans_io.collate(raw, CFG.n_max)
    # build a map first (mapping mode)
    state, _ = pipeline.run_sequence(jnp.asarray(padded), CFG)
    map_before = np.asarray(state.map_valid).sum()
    occ_before = np.asarray(state.occ).copy()

    # replay in localization mode starting from pose 0 against the built map
    loc_cfg = CFG.replace(localization_only=True)
    step = pipeline.make_step(loc_cfg)
    st = state._replace(pose=jnp.zeros(3, jnp.float32))
    poses = []
    for i in range(1, 10):
        st, out = step(st, jnp.asarray(padded[i]))
        poses.append((np.asarray(out.pose), bool(out.accepted)))
    assert any(acc for _, acc in poses)
    # the map and occupancy are untouched
    assert np.asarray(st.map_valid).sum() == map_before
    np.testing.assert_array_equal(np.asarray(st.occ), occ_before)


def test_state_checkpoint_resume(scan_sequence, tmp_path):
    raw = scan_sequence[:15]
    eng = Slam(CFG)
    for s in raw[:10]:
        eng.add_scan(s)
    path = str(tmp_path / "slam_state.npz")
    eng.save_state(path)
    pose_at_save = eng.pose.copy()

    # resume in a fresh engine and continue
    eng2 = Slam(CFG)
    eng2.load_state(path)
    np.testing.assert_array_equal(eng2.pose, pose_at_save)
    assert len(eng2.map_points()) == len(eng.map_points())

    out_a = eng.add_scan(raw[10])
    out_b = eng2.add_scan(raw[10])
    np.testing.assert_allclose(out_a["pose"], out_b["pose"], atol=1e-4)
    assert out_a["accepted"] == out_b["accepted"]


def test_load_reference_binary_pcd():
    """Open3D (the reference's writer) emits DATA binary; the reference's own
    saved artifact must load (`slam_offline.py:446-455` output)."""
    import os

    import pytest

    from icp_slam_yolo_tpu.io.maps import load_pcd

    path = "/root/reference/global_map_offline.pcd"
    if not os.path.exists(path):
        pytest.skip("reference artifact unavailable")
    pts = np.asarray(load_pcd(path))
    assert pts.shape == (11283, 3)
    assert np.isfinite(pts).all()
    # mm-scale arena coordinates
    assert 1000 < np.abs(pts[:, :2]).max() < 50000


def test_motion_model_step_runs():
    """Constant-velocity init: the realtime default config (motion_model=True,
    GICP rescue) compiles and tracks on a short prefix."""
    import icp_slam_yolo_tpu as slam

    import os

    import pytest

    if not os.path.isdir("/root/reference/Scan_data_1"):
        pytest.skip("reference scan data unavailable")
    cfg = slam.REALTIME_CONFIG.replace(map_capacity=2048)
    scans, _, _ = scans_io.load_sequence(
        "/root/reference/Scan_data_1", 1, 21, n_max=cfg.n_max
    )
    eng = slam.Slam(cfg)
    state, outs = eng.run(scans)
    acc = np.asarray(outs.accepted)
    assert acc.mean() > 0.7
    assert np.isfinite(np.asarray(state.pose)).all()
