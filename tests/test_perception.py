"""Perception geometry: stereo triangulation, pallet pose, OBB heuristics, PnP."""

import numpy as np
import jax.numpy as jnp

from icp_slam_yolo_tpu.perception.obb_pose import (
    analyze_object_pose,
    estimate_3d_pose,
    project_points,
    sort_corners,
)
from icp_slam_yolo_tpu.perception.stereo import (
    pallet_alignment,
    pallet_orientation_and_distance,
    stereo_to_3d,
)

F, CX, CY, B = 381.0, 320.0, 240.0, 26.0
K = np.array([[F, 0, CX], [0, F, CY], [0, 0, 1]], np.float32)


def _project(p3d, shift_x=0.0):
    """Pinhole-project camera-frame mm points; shift_x simulates the right camera."""
    p = np.asarray(p3d, float)
    u = (p[:, 0] - shift_x) * F / p[:, 2] + CX
    v = p[:, 1] * F / p[:, 2] + CY
    return np.stack([u, v], axis=1)


def test_stereo_roundtrip():
    pts = np.array([[100.0, -50, 800], [-120, 60, 1000], [0, 0, 600], [40, 40, 900]])
    left = _project(pts)
    right = _project(pts, shift_x=B)
    rec = np.asarray(stereo_to_3d(left, right))
    np.testing.assert_allclose(rec, pts, rtol=1e-4)


def test_pallet_orientation_frontal():
    # frontal square: normal +z, yaw 0
    corners = jnp.asarray([[0.0, 0, 800], [110, 0, 800], [110, 100, 800], [0, 100, 800]])
    normal, yaw, depth = pallet_orientation_and_distance(corners)
    np.testing.assert_allclose(np.asarray(normal), [0, 0, 1], atol=1e-6)
    assert abs(float(yaw)) < 1e-6
    assert abs(float(depth) - 800) < 1e-3


def test_pallet_orientation_yawed():
    yaw_true = np.radians(20)
    # plane rotated about the vertical axis
    xs = np.array([0.0, 110, 110, 0])
    ys = np.array([0.0, 0, 100, 100])
    pts = np.stack([xs * np.cos(yaw_true), ys, 800 + xs * np.sin(yaw_true)], axis=1)
    _, yaw, _ = pallet_orientation_and_distance(jnp.asarray(pts))
    assert abs(abs(float(yaw)) - yaw_true) < 1e-4


def test_pallet_alignment_direction():
    # pallet centred 400mm to the right at 1m: direction should be +1 (right)
    pts = np.array([[345.0, -50, 1000], [455, -50, 1000], [455, 50, 1000], [345, 50, 1000]])
    left = _project(pts)
    right = _project(pts, shift_x=B)
    out = pallet_alignment(left, right)
    assert int(out.direction) == 1
    assert float(out.distance_mm) > 900
    centered = pts - np.array([400.0, 0, 0])
    out2 = pallet_alignment(_project(centered), _project(centered, shift_x=B))
    assert int(out2.direction) == 0


def test_sort_corners():
    corners = np.array([[10.0, 100], [90, 0], [10, 0], [90, 100]])
    s = np.asarray(sort_corners(jnp.asarray(corners)))
    np.testing.assert_array_equal(s, [[10, 0], [90, 0], [10, 100], [90, 100]])


def test_analyze_object_pose_codes():
    # right side shorter -> viewed from the right -> ratio>1.2 -> rotation +1
    coords = jnp.asarray([[100.0, 0], [200, 20], [100, 120], [200, 100]])
    pose = analyze_object_pose(coords, image_width=640)
    assert int(pose.position) == -1  # centre x = 150 < 320-96
    assert int(pose.rotation) == 1
    # roll of the bottom edge
    assert abs(float(pose.roll_deg) - np.degrees(np.arctan2(-20, 100))) < 1e-3


def test_planar_pnp_recovers_pose():
    w, h = 110.0, 15.0
    obj = np.array([[0, h, 0], [w, h, 0], [w, 0, 0], [0, 0, 0]], float)
    yaw = np.radians(25)
    r_true = np.array(
        [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]]
    )
    t_true = np.array([-40.0, 10.0, 600.0])
    cam = obj @ r_true.T + t_true
    img = _project(cam)
    r, t, euler = estimate_3d_pose(jnp.asarray(img), (w, h), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(t), t_true, rtol=0.02, atol=2.0)
    np.testing.assert_allclose(np.asarray(r), r_true, atol=0.02)
    # reprojection closes the loop
    reproj = np.asarray(project_points(jnp.asarray(obj, jnp.float32), r, t, jnp.asarray(K)))
    np.testing.assert_allclose(reproj, img, atol=1.0)


def test_mono_pose_from_corners():
    """The reference's mono realtime flow (`obb2.py:230-323`) as one call:
    ordered corners of a known-pose pallet face -> distance/yaw/Euler."""
    from icp_slam_yolo_tpu.perception.obb_pose import mono_pose_from_corners

    w, h = 110.0, 15.0
    obj = np.array([[0, h, 0], [w, h, 0], [w, 0, 0], [0, 0, 0]], float)
    yaw = np.radians(15)
    r_true = np.array(
        [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]]
    )
    t_true = np.array([280.0, 5.0, 900.0])
    img = _project(obj @ r_true.T + t_true)
    out = mono_pose_from_corners(jnp.asarray(img), jnp.asarray(K), (w, h))
    assert abs(float(out["distance_mm"]) - np.linalg.norm(t_true)) < 15.0
    assert abs(float(out["yaw_deg"]) - np.degrees(np.arctan2(t_true[0], t_true[2]))) < 1.5
    # +280 mm @ 900 mm projects ~119 px right of centre, past the 0.15*width
    # (96 px) band `obb2.py:30-37` uses for the left/centre/right call
    assert int(out["position"]) == 1
    assert np.isfinite(np.asarray(out["euler_deg"])).all()
