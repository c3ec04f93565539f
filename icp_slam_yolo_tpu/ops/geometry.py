"""Scan geometry: polar gating/conversion and SE(2) rigid transforms.

Masked TPU-native replacements for the reference's per-point Python loops
(`duc/ICP_LIDAR/process.py:38-52` polar conversion; `gicp_lidar.py:37-41`
transform apply).  Nothing here compacts arrays — points are kept in place with
a validity mask so every shape is static under ``jit``.

Poses are SE(2) triples ``(x_mm, y_mm, theta_rad)``; helpers convert to/from
the reference's 4x4 homogeneous matrices (z == 0 throughout the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.config import GateConfig


def polar_to_cartesian(scan: jnp.ndarray, gate: GateConfig):
    """Convert raw polar rows to gated cartesian points.

    Mirrors `process.py:38-52`: keep a point iff
    ``min_dist < d < max_dist and quality > min_quality`` and (optionally) the
    front-arc test ``angle <= 135 or angle >= 225``; convert with
    ``x = d*cos(a)``, ``y = -d*sin(a)``.  Padded rows (all-zero) fail the gates.

    Args:
      scan: ``(N, 3)`` float array of ``[quality, angle_deg, distance_mm]``.
      gate: gating thresholds.

    Returns:
      ``(xy, valid)``: ``(N, 2)`` float32 cartesian mm and ``(N,)`` bool mask.
      Invalid points are zeroed.
    """
    quality = scan[:, 0]
    angle = scan[:, 1]
    dist = scan[:, 2]

    valid = (dist > gate.min_dist_mm) & (dist < gate.max_dist_mm) & (quality > gate.min_quality)
    if gate.front_arc_only:
        valid &= (angle <= gate.front_arc_lo_deg) | (angle >= gate.front_arc_hi_deg)

    rad = jnp.deg2rad(angle)
    x = dist * jnp.cos(rad)
    y = gate.y_sign * dist * jnp.sin(rad)
    xy = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    xy = jnp.where(valid[:, None], xy, 0.0)
    return xy, valid


def se2_identity() -> jnp.ndarray:
    return jnp.zeros(3, dtype=jnp.float32)


def se2_rotation(pose: jnp.ndarray) -> jnp.ndarray:
    """2x2 rotation matrix of an SE(2) pose ``(x, y, theta)``."""
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    return jnp.array([[c, -s], [s, c]], dtype=pose.dtype)

def se2_apply(pose: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to ``(N, 2)`` points: ``R @ p + t`` (cf. `gicp_lidar.py:37-41`).

    Written elementwise (VPU) rather than as a matmul: an ``(N, 2) @ (2, 2)``
    contraction would hit the MXU in bfloat16 by default, losing ~8 mm on
    metre-scale coordinates.
    """
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    x, y = xy[..., 0], xy[..., 1]
    return jnp.stack([c * x - s * y + pose[0], s * x + c * y + pose[1]], axis=-1)


def se2_compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Composition ``a ∘ b`` (apply ``b`` first, then ``a``)."""
    xy = se2_apply(a, b[None, :2])[0]
    return jnp.array([xy[0], xy[1], a[2] + b[2]], dtype=a.dtype)


def se2_extrapolate(pose: jnp.ndarray, prev_pose: jnp.ndarray) -> jnp.ndarray:
    """Constant-velocity prediction: replay the last inter-scan motion once
    more.  ``delta = pose ∘ prev_pose⁻¹`` (the world-frame step from the
    previous pose to the current one), prediction ``delta ∘ pose``.  With
    ``prev_pose == pose`` (start-up, or after a rejected scan) this is the
    identity extrapolation — the plain current-pose init the reference uses
    (`gicp_lidar.py:29` init = current global pose)."""
    delta = se2_compose(pose, se2_inverse(prev_pose))
    return se2_compose(delta, pose)


def se2_inverse(pose: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    x, y = pose[0], pose[1]
    return jnp.array([-(c * x + s * y), -(-s * x + c * y), -pose[2]], dtype=pose.dtype)


def se2_to_mat44(pose: jnp.ndarray) -> jnp.ndarray:
    """SE(2) -> 4x4 homogeneous matrix (the reference's pose format)."""
    c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
    m = jnp.eye(4, dtype=pose.dtype)
    m = m.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
    m = m.at[0, 3].set(pose[0]).at[1, 3].set(pose[1])
    return m


def mat44_to_se2(m: jnp.ndarray) -> jnp.ndarray:
    theta = jnp.arctan2(m[1, 0], m[0, 0])
    return jnp.array([m[0, 3], m[1, 3], theta], dtype=jnp.float32)


def transform_points(points: jnp.ndarray, rotation: jnp.ndarray, translation: jnp.ndarray) -> jnp.ndarray:
    """``points @ R.T + t`` — API parity with `gicp_lidar.py:37-41` (any dim)."""
    return jnp.matmul(points, rotation.T, precision=jax.lax.Precision.HIGHEST) + translation


def masked_mean(xy: jnp.ndarray, valid: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Mean over valid points; zero when no point is valid."""
    w = valid.astype(xy.dtype)
    denom = jnp.maximum(w.sum(axis), 1.0)
    return (xy * w[..., None]).sum(axis) / denom
