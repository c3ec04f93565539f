"""Stereo triangulation and pallet pose/alignment geometry (jittable).

TPU-native mirror of the reference camera math:
  * `stereo_to_3d` — corner-wise disparity triangulation (`duc/ICP_LIDAR/img.py:3-14`):
    ``Z = f*B/|xL - xR|``, ``X = (xL - cx) Z / f``, ``Y = (yL - cy) Z / f``.
  * `pallet_orientation_and_distance` — plane normal from corner edge cross
    product, flipped to +z, yaw = ``atan2(n_x, n_z)``, depth = mean corner Z
    (`img.py:16-38`).
  * `pallet_alignment` — horizontal angle to centre, px->mm scale from the
    known 110 mm pallet width foreshortened by yaw, lateral offset and
    left/centre/right classification (`mainn.py:211-247`, thresholds +-5 deg).

Default intrinsics come from `Config.py:27-30`: f=381, cx=320, cy=240, B=26.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.config import STEREO_BASELINE, STEREO_CX, STEREO_CY, STEREO_F

PALLET_WIDTH_MM = 110.0     # `mainn.py:222` known object width
LATERAL_OFFSET_BIAS = 13.0  # `mainn.py:230` dis_lech = delta_x/px_mm - 13
ALIGN_DEG_THRESHOLD = 5.0   # `mainn.py:237-247` left/right classification


def stereo_to_3d(points_left, points_right, f=STEREO_F, cx=STEREO_CX, cy=STEREO_CY, b=STEREO_BASELINE):
    """``(N, 2)`` pixel corners in both views -> ``(N, 3)`` camera-frame mm."""
    pl = jnp.asarray(points_left, jnp.float32)
    pr = jnp.asarray(points_right, jnp.float32)
    disparity = jnp.abs(pl[:, 0] - pr[:, 0])
    disparity = jnp.where(disparity == 0, 1e-6, disparity)
    z = (f * b) / disparity
    x = (pl[:, 0] - cx) * z / f
    y = (pl[:, 1] - cy) * z / f
    return jnp.stack([x, y, z], axis=1)


def pallet_orientation_and_distance(corners_3d):
    """``(4, 3)`` corner points -> ``(normal (3,), yaw_rad, mean_depth)``."""
    c = jnp.asarray(corners_3d, jnp.float32)
    v1 = c[1] - c[0]
    v2 = c[2] - c[0]
    normal = jnp.cross(v1, v2)
    normal = normal / jnp.maximum(jnp.linalg.norm(normal), 1e-9)
    normal = jnp.where(normal[2] < 0, -normal, normal)
    yaw = jnp.arctan2(normal[0], normal[2])
    mean_depth = jnp.mean(c[:, 2])
    return normal, yaw, mean_depth


class PalletAlignment(NamedTuple):
    horizontal_angle_rad: jnp.ndarray  # angle to pallet centre (atan2(X, Z))
    lateral_offset_mm: jnp.ndarray     # signed offset from camera axis
    yaw_rad: jnp.ndarray
    distance_mm: jnp.ndarray
    direction: jnp.ndarray             # -1 left / 0 centre / +1 right


@jax.jit
def pallet_alignment(corners_left, corners_right, f=STEREO_F, cx=STEREO_CX, cy=STEREO_CY, b=STEREO_BASELINE):
    """Full pallet alignment readout from stereo corner pairs (`mainn.py:211-247`).

    Jitted: ~30 eager dispatches per call cost seconds in this environment;
    compiled it's microseconds."""
    c3d = stereo_to_3d(corners_left, corners_right, f, cx, cy, b)
    _, yaw, depth = pallet_orientation_and_distance(c3d)
    center = jnp.mean(c3d, axis=0)
    horiz = jnp.arctan2(center[0], center[2])

    # px->mm from the known pallet width foreshortened by yaw (`mainn.py:222-228`)
    cl = jnp.asarray(corners_left, jnp.float32)
    px_width = jnp.maximum(jnp.max(cl[:, 0]) - jnp.min(cl[:, 0]), 1e-6)
    eff_width = PALLET_WIDTH_MM * jnp.abs(jnp.cos(yaw))
    px_per_mm = px_width / jnp.maximum(eff_width, 1e-6)
    delta_x = jnp.mean(cl[:, 0]) - cx
    lateral = delta_x / px_per_mm - LATERAL_OFFSET_BIAS

    deg = jnp.rad2deg(horiz)
    direction = jnp.where(deg < -ALIGN_DEG_THRESHOLD, -1, jnp.where(deg > ALIGN_DEG_THRESHOLD, 1, 0))
    return PalletAlignment(horiz, lateral, yaw, depth, direction.astype(jnp.int32))
