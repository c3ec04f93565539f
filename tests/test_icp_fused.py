"""The fully-fused Pallas ICP kernel (interpreter mode) vs the XLA path."""

import numpy as np
import jax.numpy as jnp

from icp_slam_yolo_tpu.config import OFFLINE_GATE, IcpConfig
from icp_slam_yolo_tpu.core.registration import icp_masked
from icp_slam_yolo_tpu.ops.pallas.icp_fused import icp_fused_pallas
from icp_slam_yolo_tpu.reference_impl import oracle


def _pad(p, n):
    xy = np.zeros((n, 2), np.float32)
    xy[: len(p)] = p[:n]
    v = np.zeros(n, bool)
    v[: min(len(p), n)] = True
    return jnp.asarray(xy), jnp.asarray(v)


def test_fused_matches_xla_on_golden_pair(scan_pair):
    a = oracle.polar_gate(scan_pair[0], OFFLINE_GATE)
    b = oracle.polar_gate(scan_pair[1], OFFLINE_GATE)
    src = oracle.voxel_downsample(b, 20.0)
    sxy, sv = _pad(src, 512)
    txy, tv = _pad(a, 512)
    init = jnp.zeros(3, jnp.float32)

    cfg = IcpConfig(backend="xla")
    ref = icp_masked(sxy, sv, txy, tv, init, cfg)

    pose, rmse, n_in, n_iters = icp_fused_pallas(
        sxy, sv, txy, tv, init, iters=50, threshold_mm=200.0, interpret=True
    )
    np.testing.assert_allclose(np.asarray(pose), np.asarray(ref.pose), atol=1.0)
    assert abs(float(pose[2]) - float(ref.pose[2])) < 2e-3
    assert abs(float(rmse) - float(ref.rmse)) < 1.0
    assert int(n_in) > 50


def test_fused_recovers_known_transform(rng):
    theta = np.radians(8.0)
    t = np.array([120.0, -60.0])
    tgt = rng.normal(size=(256, 2)) * 3000.0
    c, s = np.cos(theta), np.sin(theta)
    src = (tgt - t) @ np.array([[c, -s], [s, c]])
    sxy, sv = _pad(src, 256)
    txy, tv = _pad(tgt, 256)
    pose, rmse, n_in, _ = icp_fused_pallas(
        sxy, sv, txy, tv, jnp.zeros(3, jnp.float32), iters=50, threshold_mm=500.0, interpret=True
    )
    assert abs(float(pose[2]) - theta) < 2e-3
    np.testing.assert_allclose(np.asarray(pose[:2]), t, atol=10.0)
    assert float(rmse) < 10.0


def test_fused_no_inliers():
    sxy, sv = _pad(np.zeros((32, 2)) + 1e5, 128)
    txy, tv = _pad(np.zeros((32, 2)) - 1e5, 128)
    pose, rmse, n_in, _ = icp_fused_pallas(
        sxy, sv, txy, tv, jnp.zeros(3, jnp.float32), iters=5, threshold_mm=10.0, interpret=True
    )
    assert not np.isfinite(float(rmse))
    assert int(n_in) == 0
