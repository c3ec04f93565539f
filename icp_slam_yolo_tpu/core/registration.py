"""Scan registration: masked ICP with correspondence gating, compiled for TPU.

This is the TPU-native replacement for the reference's registration layer:

  * Open3D GICP wrapper `duc/ICP_LIDAR/gicp_lidar.py:12-36` (voxel downsample
    both clouds, 50 iterations, correspondence threshold, init = current pose,
    returns ``(inlier_rmse, 4x4 T)``),
  * point-to-point variant `duc/ICP_LIDAR/ds.py:16-26`,
  * pure-NumPy KDTree ICP `labels_segmentation/icp.py:28-53`.

Design: brute-force NN correspondence as an MXU matmul (`ops/nn.py`), gated at
``threshold_mm``, closed-form 2-D Kabsch solve (`ops/kabsch.py`), iterated under
``jax.lax.scan`` with a convergence freeze (once the mean correspondence error
stops changing by ``tolerance``, further iterations become no-ops — matching
Open3D's convergence criteria without data-dependent trip counts).

``inlier_rmse`` follows Open3D's definition: RMS distance over correspondences
within the threshold after the final transform; no inliers -> +inf, and clouds
with fewer than ``min_points`` valid points -> +inf (`gicp_lidar.py:13-15`).

Estimators: ``point_to_point`` (default, closed-form Kabsch; eligible for the
fully-fused Pallas kernel), ``point_to_plane`` (one-NN tangent normals), and
``gicp`` — the covariance-weighted Generalized ICP the reference's primary
registration uses (`gicp_lidar.py:23-35`): k-NN local covariances regularised
to Segal's plane-to-plane form, Mahalanobis Gauss-Newton solve per iteration.
Validation is trajectory-level per SURVEY.md section 7.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from icp_slam_yolo_tpu.config import IcpConfig
from icp_slam_yolo_tpu.ops import geometry as geo
from icp_slam_yolo_tpu.ops.kabsch import best_fit_se2
from icp_slam_yolo_tpu.ops.nn import nearest_neighbor, pairwise_sqdist
from icp_slam_yolo_tpu.ops.voxel import voxel_downsample


class RegistrationResult(NamedTuple):
    pose: jnp.ndarray      # (3,) SE(2) map-from-scan transform (x_mm, y_mm, theta)
    rmse: jnp.ndarray      # scalar inlier RMSE (mm); +inf if degenerate
    fitness: jnp.ndarray   # inliers / valid source points
    n_inliers: jnp.ndarray # scalar int32
    n_iters: jnp.ndarray   # iterations before convergence freeze


def _target_normals(tgt_xy: jnp.ndarray, tgt_valid: jnp.ndarray) -> jnp.ndarray:
    """2-D normals per target point from its nearest valid neighbour: the local
    tangent is the direction to the closest other point; the normal is its
    perpendicular.  Cheap stand-in for Open3D's covariance normals
    (`gicp_lidar.py:23-27`) that works under one matmul.
    """
    center = geo.masked_mean(tgt_xy, tgt_valid)
    p = (tgt_xy - center) * 1e-3
    d2 = pairwise_sqdist(p, p)
    n = tgt_xy.shape[0]
    eye = jnp.eye(n, dtype=bool)
    d2 = jnp.where(eye | ~tgt_valid[None, :], 1e30, d2)
    nn_idx = jnp.argmin(d2, axis=1)
    tangent = tgt_xy[nn_idx] - tgt_xy
    norm = jnp.sqrt(jnp.sum(tangent * tangent, axis=-1, keepdims=True))
    tangent = tangent / jnp.maximum(norm, 1e-6)
    return jnp.stack([-tangent[:, 1], tangent[:, 0]], axis=-1)


def icp_masked(
    src_xy: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt_xy: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    init_pose: jnp.ndarray,
    cfg: IcpConfig = IcpConfig(),
) -> RegistrationResult:
    """Masked fixed-shape ICP aligning ``src`` onto ``tgt``.

    Args:
      src_xy / src_valid: ``(N, 2)`` float32 mm + mask (sensor frame).
      tgt_xy / tgt_valid: ``(M, 2)`` float32 mm + mask (map frame).
      init_pose: ``(3,)`` SE(2) initial guess (the current global pose, as in
        `slam_offline.py:382`).

    Returns a `RegistrationResult` whose ``pose`` maps sensor frame -> map frame.
    """
    init_pose = init_pose.astype(jnp.float32)
    n_src = jnp.sum(src_valid)
    n_tgt = jnp.sum(tgt_valid)

    fusable = (
        cfg.estimator == "point_to_point"
        and cfg.huber_delta_mm == 0
        and src_xy.shape[0] % 8 == 0
        and tgt_xy.shape[0] % 128 == 0
    )
    if cfg.backend == "fused" or (cfg.backend == "auto" and fusable and jax.default_backend() == "tpu"):
        from icp_slam_yolo_tpu.ops.pallas.icp_fused import icp_fused_pallas

        pose, rmse, n_in, n_iters = icp_fused_pallas(
            src_xy, src_valid, tgt_xy, tgt_valid, init_pose,
            iters=cfg.max_iterations, threshold_mm=cfg.threshold_mm, tolerance=cfg.tolerance,
            early_exit=cfg.early_exit, interpret=jax.default_backend() != "tpu",
            anderson=cfg.anderson,
        )
        degenerate = (n_src < cfg.min_points) | (n_tgt < cfg.min_points) | (n_in == 0)
        rmse = jnp.where(degenerate, jnp.float32(jnp.inf), rmse)
        pose = jnp.where(degenerate, init_pose, pose)
        fitness = n_in / jnp.maximum(n_src, 1)
        return RegistrationResult(pose=pose, rmse=rmse, fitness=fitness, n_inliers=n_in, n_iters=n_iters)

    use_p2l = cfg.estimator == "point_to_plane"
    use_gicp = cfg.estimator == "gicp"
    normals = _target_normals(tgt_xy, tgt_valid) if use_p2l else None
    if use_gicp:
        from icp_slam_yolo_tpu.ops.nn import local_covariances, local_covariances_at

        # regularised local source covariances (Segal plane-to-plane) in the
        # sensor frame, rotated per iteration; target covariances are
        # evaluated at the *matched* points inside the loop (sweeping all
        # target slots up front costs ~50x more on a 24k-point map)
        cov_src = local_covariances(src_xy, src_valid, cfg.gicp_k, cfg.gicp_epsilon)

    def _gicp_step(pose, moved, matched, w):
        """One Gauss-Newton step of the GICP objective
        ``sum_i w_i r_i^T (C_tgt_i + R C_src_i R^T)^{-1} r_i`` over SE(2)
        (`gicp_lidar.py:31-35`'s TransformationEstimationForGeneralizedICP).
        Solved in metres so the 3x3 normal matrix stays f32-conditioned.
        """
        rot = geo.se2_rotation(pose)
        ca = jnp.einsum(
            "ab,nbc,dc->nad", rot, cov_src, rot, precision=jax.lax.Precision.HIGHEST
        )
        s = local_covariances_at(matched, tgt_xy, tgt_valid, cfg.gicp_k, cfg.gicp_epsilon) + ca
        det = jnp.maximum(s[:, 0, 0] * s[:, 1, 1] - s[:, 0, 1] * s[:, 1, 0], 1e-12)
        m00, m01, m11 = s[:, 1, 1] / det, -s[:, 0, 1] / det, s[:, 0, 0] / det

        pm = moved * jnp.float32(1e-3)
        r = pm - matched * jnp.float32(1e-3)
        jx, jy = -pm[:, 1], pm[:, 0]  # d(residual)/d(theta) = perp(p)
        u0 = m00 * r[:, 0] + m01 * r[:, 1]
        u1 = m01 * r[:, 0] + m11 * r[:, 1]
        t0 = m00 * jx + m01 * jy
        t1 = m01 * jx + m11 * jy
        a00, a01, a02 = jnp.sum(w * m00) + 1e-9, jnp.sum(w * m01), jnp.sum(w * t0)
        a11, a12 = jnp.sum(w * m11) + 1e-9, jnp.sum(w * t1)
        a22 = jnp.sum(w * (jx * t0 + jy * t1)) + 1e-9
        g0, g1, g2 = jnp.sum(w * u0), jnp.sum(w * u1), jnp.sum(w * (jx * u0 + jy * u1))
        # closed-form symmetric 3x3 solve (adjugate/Cramer) — H is SPD and
        # O(1)-conditioned in metres; linalg.solve's LU path is overkill and
        # multiplies XLA compile time inside the scan loop
        c00 = a11 * a22 - a12 * a12
        c01 = a02 * a12 - a01 * a22
        c02 = a01 * a12 - a02 * a11
        c11 = a00 * a22 - a02 * a02
        c12 = a01 * a02 - a00 * a12
        c22 = a00 * a11 - a01 * a01
        det = a00 * c00 + a01 * c01 + a02 * c02
        inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
        d0 = -(c00 * g0 + c01 * g1 + c02 * g2) * inv_det
        d1 = -(c01 * g0 + c11 * g1 + c12 * g2) * inv_det
        d2 = -(c02 * g0 + c12 * g1 + c22 * g2) * inv_det
        delta = jnp.stack([d0, d1, d2])
        delta = jnp.where(jnp.isfinite(delta), delta, 0.0)
        return jnp.array([delta[0] * 1e3, delta[1] * 1e3, delta[2]], jnp.float32)

    # Anderson(1) acceleration (AA-ICP, arxiv 1709.05479): treat one ICP
    # iteration as the fixed-point map g and extrapolate through the last two
    # iterates with the residual-minimising coefficient
    #   gamma = <f_k, f_k - f_{k-1}> / ||f_k - f_{k-1}||^2,
    #   x_{k+1} = g_k - gamma (g_k - g_{k-1}),
    # where f = g(x) - x is the per-iteration pose delta.  For a linear
    # contraction with rate lambda this lands on the fixpoint in one step
    # (gamma = lambda/(lambda-1) < 0 — an extrapolation).  Safeguards: the
    # rotation component is scaled to millimetre units (1 mrad ~ 1 mm at 1 m)
    # so the inner products are balanced; gamma is clamped; and a residual
    # increase (NN reassignment kink) resets to the plain step.
    _AA_SCALE = jnp.asarray([1.0, 1.0, 1000.0], jnp.float32)
    _AA_GAMMA_MIN = -9.0  # extrapolation cap: ~10x speedup at lambda ~ 0.9

    def body(carry, _):
        if cfg.anderson:
            pose, prev_err, done, iters, prev_f, prev_g, have_prev = carry
        else:  # carry shape (and the traced graph) identical to plain ICP
            pose, prev_err, done, iters = carry
        moved = geo.se2_apply(pose, src_xy)
        dist, idx = nearest_neighbor(moved, tgt_xy, tgt_valid, src_valid)
        matched = tgt_xy[idx]
        w = (src_valid & (dist < cfg.threshold_mm)).astype(jnp.float32)
        if cfg.huber_delta_mm > 0:
            w = w * jnp.minimum(1.0, cfg.huber_delta_mm / jnp.maximum(dist, 1e-6))
        if use_gicp:
            delta = _gicp_step(pose, moved, matched, w)
        else:
            if use_p2l:
                # project the residual onto the target normal: solve point-to-point
                # against the foot of the perpendicular (one Gauss-Newton step of
                # the point-to-plane objective, exact for small angles)
                nrm = normals[idx]
                resid = jnp.sum((matched - moved) * nrm, axis=-1, keepdims=True)
                matched = moved + resid * nrm
            dtheta, dt = best_fit_se2(moved, matched, w)
            delta = jnp.array([dt[0], dt[1], dtheta], jnp.float32)
        new_pose = geo.se2_compose(delta, pose)

        if cfg.anderson:
            f = (new_pose - pose) * _AA_SCALE
            df = f - prev_f
            den = jnp.sum(df * df)
            gamma = jnp.where(den > 1e-12, jnp.sum(f * df) / jnp.maximum(den, 1e-12), 0.0)
            gamma = jnp.clip(gamma, _AA_GAMMA_MIN, 0.0)  # only extrapolate
            # reset on residual growth: the NN assignment changed regime
            ok = have_prev & (jnp.sum(f * f) <= jnp.sum(prev_f * prev_f))
            gamma = jnp.where(ok, gamma, 0.0)
            accel = new_pose - gamma * (new_pose - prev_g)
            next_pose = jnp.where(jnp.all(jnp.isfinite(accel)), accel, new_pose)
            prev_f, prev_g, have_prev = f, new_pose, jnp.bool_(True)
        else:
            next_pose = new_pose

        err = jnp.sum(jnp.where(w > 0, dist, 0.0)) / jnp.maximum(jnp.sum(w > 0), 1)
        converged = jnp.abs(prev_err - err) < cfg.tolerance
        new_done = done | converged
        pose = jnp.where(done, pose, next_pose)
        iters = iters + jnp.where(done, 0, 1)
        if cfg.anderson:
            return (pose, err, new_done, iters, prev_f, prev_g, have_prev), None
        return (pose, err, new_done, iters), None

    init_err = jnp.float32(1e30)
    init_carry = (init_pose, init_err, jnp.bool_(False), jnp.int32(0))
    if cfg.anderson:
        init_carry = init_carry + (jnp.zeros(3, jnp.float32), init_pose, jnp.bool_(False))
    carry_out, _ = jax.lax.scan(body, init_carry, None, length=cfg.max_iterations)
    pose, iters = carry_out[0], carry_out[3]

    moved = geo.se2_apply(pose, src_xy)
    dist, _ = nearest_neighbor(moved, tgt_xy, tgt_valid, src_valid)
    inlier = src_valid & (dist < cfg.threshold_mm)
    n_in = jnp.sum(inlier)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inlier, dist * dist, 0.0)) / jnp.maximum(n_in, 1))
    degenerate = (n_src < cfg.min_points) | (n_tgt < cfg.min_points) | (n_in == 0)
    rmse = jnp.where(degenerate, jnp.float32(jnp.inf), rmse)
    pose = jnp.where(degenerate, init_pose, pose)
    fitness = n_in / jnp.maximum(n_src, 1)
    return RegistrationResult(pose=pose, rmse=rmse, fitness=fitness, n_inliers=n_in, n_iters=iters)


# host-facing entry: jitted once per (shape, cfg); the pipeline traces
# `icp_masked` directly inside its own jit (nested jits confuse dispatch)
icp_masked_jit = partial(jax.jit, static_argnames=("cfg",))(icp_masked)


def _pad_points(points: np.ndarray, n: int):
    pts = np.asarray(points, dtype=np.float32)[:, :2]
    m = min(len(pts), n)
    out = np.zeros((n, 2), np.float32)
    out[:m] = pts[:m]
    valid = np.zeros(n, bool)
    valid[:m] = True
    return jnp.asarray(out), jnp.asarray(valid)


def icp(src_points, tgt_points, init_pose=None, cfg: IcpConfig = IcpConfig(), pad_to: int = 512):
    """Convenience host API: register raw ``(N, 2/3)`` arrays (pads + masks).

    Returns `RegistrationResult`.  Mirrors the `register(src, dst)` contract of
    `ds.py:16-26` with an SE(2) result.
    """
    def _round_up(n: int, mult: int) -> int:
        return -(-n // mult) * mult

    s, sv = _pad_points(np.asarray(src_points), _round_up(min(len(np.asarray(src_points)), pad_to) or 8, 8))
    # target length rounds up to the lane width (the fused kernel requires it)
    t, tv = _pad_points(np.asarray(tgt_points), _round_up(max(pad_to, len(np.asarray(tgt_points))), 128))
    init = geo.se2_identity() if init_pose is None else jnp.asarray(init_pose, jnp.float32)
    return icp_masked_jit(s, sv, t, tv, init, cfg)


def register(src_points, dst_points, init_pose=None, cfg: IcpConfig = IcpConfig()):
    """Public ``register(src, dst) -> (R, t)`` API named in BASELINE.json.

    Returns ``(R, t, rmse)`` with ``R`` a 2x2 rotation and ``t`` ``(2,)`` mm.
    """
    res = icp(src_points, dst_points, init_pose=init_pose, cfg=cfg)
    r = geo.se2_rotation(res.pose)
    return np.asarray(r), np.asarray(res.pose[:2]), float(res.rmse)


def gicp(points1, points2, threshold: float = 200.0, voxel_size: float = 20.0, trans_init=None):
    """Signature/semantics parity with `gicp_lidar.py:12-36`: voxel-downsample
    both clouds, register with init transform, return ``(inlier_rmse, T4x4)``.
    Fewer than 10 points on either side returns ``(inf, eye(4))``.
    """
    p1 = np.asarray(points1, dtype=np.float32)
    p2 = np.asarray(points2, dtype=np.float32)
    if len(p1) < 10 or len(p2) < 10:
        return float("inf"), np.eye(4)

    cfg = IcpConfig(threshold_mm=float(threshold), voxel_size_mm=float(voxel_size), estimator="gicp")
    n1 = -(-len(p1) // 8) * 8
    n2 = -(-len(p2) // 128) * 128  # lane alignment for the fused kernel
    s, sv = _pad_points(p1, n1)
    t, tv = _pad_points(p2, n2)
    s, sv = voxel_downsample(s, sv, cfg.voxel_size_mm)
    t, tv = voxel_downsample(t, tv, cfg.voxel_size_mm)

    if trans_init is None:
        init = geo.se2_identity()
    else:
        ti = jnp.asarray(np.asarray(trans_init, np.float32))
        init = geo.mat44_to_se2(ti) if ti.shape == (4, 4) else ti
    res = icp_masked_jit(s, sv, t, tv, init, cfg)
    t44 = np.asarray(geo.se2_to_mat44(res.pose), dtype=np.float64)
    return float(res.rmse), t44
