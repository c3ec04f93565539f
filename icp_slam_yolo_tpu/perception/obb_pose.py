"""Oriented-box pose heuristics and planar PnP (jittable).

Mirrors `labels_segmentation/obb2.py`:
  * `analyze_object_pose` (`obb2.py:7-48`): sort 4 corners into tl/tr/bl/br,
    classify position by centre-x thirds (threshold 0.15*width), rotation by
    the left/right side-length ratio (>1.2 / <0.8), roll from the bottom edge.
  * `estimate_3d_pose` (`obb2.py:105-126`): planar-object PnP — here a
    homography-based planar pose (DLT + orthonormalisation) instead of
    OpenCV's IPPE, returning (R, t, euler_deg).

Positions/rotations are returned as integer codes (host maps them to strings,
keeping the jitted path string-free): position -1 left / 0 centre / +1 right;
rotation -1 left / 0 square / +1 right.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

POSITION_NAMES = {-1: "left", 0: "center", 1: "right"}
ROTATION_NAMES = {-1: "rotated_left", 0: "square", 1: "rotated_right"}


def sort_corners(coords: jnp.ndarray) -> jnp.ndarray:
    """``(4, 2)`` arbitrary-order corners -> rows [tl, tr, bl, br] (`obb2.py:11-19`)."""
    c = jnp.asarray(coords, jnp.float32)
    order_y = jnp.argsort(c[:, 1])
    top = c[order_y[:2]]
    bot = c[order_y[2:]]
    top = top[jnp.argsort(top[:, 0])]
    bot = bot[jnp.argsort(bot[:, 0])]
    return jnp.stack([top[0], top[1], bot[0], bot[1]])


class ObbPose(NamedTuple):
    position: jnp.ndarray  # -1/0/+1
    rotation: jnp.ndarray  # -1/0/+1
    roll_deg: jnp.ndarray


def analyze_object_pose(coords: jnp.ndarray, image_width: float, ratio_hi: float = 1.2, ratio_lo: float = 0.8) -> ObbPose:
    tl, tr, bl, br = sort_corners(coords)
    center_x = jnp.mean(jnp.asarray(coords, jnp.float32)[:, 0])
    thresh = image_width * 0.15
    position = jnp.where(
        center_x < image_width / 2 - thresh, -1, jnp.where(center_x > image_width / 2 + thresh, 1, 0)
    )
    left_len = jnp.linalg.norm(tl - bl)
    right_len = jnp.maximum(jnp.linalg.norm(tr - br), 1e-6)
    ratio = left_len / right_len
    rotation = jnp.where(ratio > ratio_hi, 1, jnp.where(ratio < ratio_lo, -1, 0))
    bottom = br - bl
    roll = jnp.rad2deg(jnp.arctan2(bottom[1], bottom[0]))
    return ObbPose(position.astype(jnp.int32), rotation.astype(jnp.int32), roll)


def _homography_dlt(obj_xy: jnp.ndarray, img_xy: jnp.ndarray) -> jnp.ndarray:
    """Plane->image homography from 4 correspondences (DLT, unit-norm solve)."""
    rows = []
    for i in range(4):
        x, y = obj_xy[i, 0], obj_xy[i, 1]
        u, v = img_xy[i, 0], img_xy[i, 1]
        rows.append(jnp.stack([x, y, 1.0, 0.0, 0.0, 0.0, -u * x, -u * y, -u]))
        rows.append(jnp.stack([0.0, 0.0, 0.0, x, y, 1.0, -v * x, -v * y, -v]))
    a = jnp.stack(rows)  # (8, 9)
    _, _, vt = jnp.linalg.svd(a)
    h = vt[-1]
    return (h / jnp.where(jnp.abs(h[8]) > 1e-12, h[8], 1.0)).reshape(3, 3)


def estimate_3d_pose(image_points: jnp.ndarray, object_dims: tuple, camera_matrix: jnp.ndarray):
    """Planar 4-point pose (`obb2.py:105-126` capability; homography route).

    Args:
      image_points: ``(4, 2)`` pixels ordered [tl, tr, br, bl] like the
        reference's object template ``[(0,h), (w,h), (w,0), (0,0)]``.
      object_dims: ``(w_mm, h_mm)`` of the planar object (110 x 15 for the
        reference pallet face, `obb2.py:107`).
      camera_matrix: ``(3, 3)`` intrinsics.

    Returns ``(R (3,3), t (3,), euler_deg (3,))`` with z forced positive.
    """
    w, h = object_dims
    obj = jnp.asarray([[0.0, h], [w, h], [w, 0.0], [0.0, 0.0]], jnp.float32)
    img = jnp.asarray(image_points, jnp.float32)
    hmg = _homography_dlt(obj, img)
    k_inv = jnp.linalg.inv(jnp.asarray(camera_matrix, jnp.float32))
    b = k_inv @ hmg
    scale = 2.0 / jnp.maximum(jnp.linalg.norm(b[:, 0]) + jnp.linalg.norm(b[:, 1]), 1e-9)
    b = b * scale
    # flip so the object sits in front of the camera
    b = jnp.where(b[2, 2] < 0, -b, b)
    r1, r2, t = b[:, 0], b[:, 1], b[:, 2]
    r3 = jnp.cross(r1, r2)
    r_approx = jnp.stack([r1, r2, r3], axis=1)
    u, _, vt = jnp.linalg.svd(r_approx)
    d = jnp.sign(jnp.linalg.det(u @ vt))
    r = u @ jnp.diag(jnp.asarray([1.0, 1.0, d])) @ vt

    # Euler (xyz, degrees) like cv2.decomposeProjectionMatrix's convention
    sy = jnp.sqrt(r[0, 0] ** 2 + r[1, 0] ** 2)
    ex = jnp.arctan2(r[2, 1], r[2, 2])
    ey = jnp.arctan2(-r[2, 0], sy)
    ez = jnp.arctan2(r[1, 0], r[0, 0])
    euler = jnp.rad2deg(jnp.stack([ex, ey, ez]))
    return r, t, euler


def mono_pose_from_corners(
    corners: jnp.ndarray,
    camera_matrix: jnp.ndarray,
    object_dims: tuple = (110.0, 15.0),
):
    """Single-camera 3-D pallet pose from ordered corners — the reference's
    realtime mono loop (`obb2.py:230-323`: OBB predict -> corner heuristics ->
    `estimate_3d_pose` -> Euler overlay) as one jittable call.

    Args:
      corners: ``(4, 2)`` pixel corners in [tl, tr, br, bl] order — exactly
        what the pose task's ``Detector`` returns in ``out["keypoints"]``
        (visibility column stripped), or `sort_corners` output reordered.
      camera_matrix: ``(3, 3)`` intrinsics.
      object_dims: planar object ``(w_mm, h_mm)`` (the reference's 110 x 15
        pallet face, `obb2.py:107`).

    Returns a dict: rotation ``R``, translation ``t`` (mm, camera frame),
    ``euler_deg``, ``distance_mm`` (norm of t), ``yaw_deg`` (horizontal angle
    to the object centre, `mainn.py:215`-style ``atan2(X, Z)``), plus the
    `analyze_object_pose` position/rotation codes computed from the corners.
    """
    c = jnp.asarray(corners, jnp.float32)
    r, t, euler = estimate_3d_pose(c, object_dims, camera_matrix)
    distance = jnp.linalg.norm(t)
    yaw = jnp.rad2deg(jnp.arctan2(t[0], jnp.maximum(t[2], 1e-6)))
    # analyze_object_pose sorts corners itself; frame width from cx (cx = w/2)
    obb = analyze_object_pose(c, 2.0 * jnp.asarray(camera_matrix, jnp.float32)[0, 2])
    return {
        "R": r, "t": t, "euler_deg": euler,
        "distance_mm": distance, "yaw_deg": yaw,
        "position": obb.position, "rotation": obb.rotation, "roll_deg": obb.roll_deg,
    }


def project_points(points_3d: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray, camera_matrix: jnp.ndarray):
    """Pinhole projection (`obb2.py:128-135` axis-overlay capability)."""
    cam = points_3d @ r.T + t
    k = jnp.asarray(camera_matrix, jnp.float32)
    uvw = cam @ k.T
    return uvw[:, :2] / jnp.maximum(uvw[:, 2:3], 1e-9)
