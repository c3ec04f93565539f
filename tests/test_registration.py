"""Registration: synthetic known-transform recovery and the reference's own
golden pair (`ds.py:80-81`: Scan_data_350 vs Scan_data_355), checked against
the NumPy oracle."""

import numpy as np
import jax.numpy as jnp

from icp_slam_yolo_tpu.config import OFFLINE_GATE, IcpConfig
from icp_slam_yolo_tpu.core.registration import gicp, icp, icp_masked, register
from icp_slam_yolo_tpu.reference_impl import oracle


def _rot(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]])


def test_icp_recovers_known_transform(rng):
    """Known-transform round trip, like the reference's self-check (`icp.py:55-78`
    30deg rotation + translation on a synthetic cloud)."""
    theta = np.radians(10.0)
    t = np.array([150.0, 80.0])
    tgt = rng.normal(size=(300, 2)) * 3000.0
    src = (tgt - t) @ _rot(theta)  # src such that R src + t = tgt
    res = icp(src, tgt, cfg=IcpConfig(threshold_mm=500.0, max_iterations=50))
    assert abs(float(res.pose[2]) - theta) < 2e-3
    np.testing.assert_allclose(np.asarray(res.pose[:2]), t, atol=10.0)
    assert float(res.rmse) < 10.0


def test_register_api(rng):
    tgt = rng.normal(size=(200, 2)) * 2000.0
    r_true = _rot(0.05)
    t_true = np.array([60.0, -40.0])
    src = (tgt - t_true) @ r_true
    r, t, rmse = register(src, tgt)
    np.testing.assert_allclose(r, r_true.T if False else _rot(0.05), atol=5e-3)
    np.testing.assert_allclose(t, t_true, atol=8.0)
    assert rmse < 10.0


def test_golden_pair_matches_oracle(scan_pair):
    """TPU ICP vs the float64 NumPy oracle on the reference's demo pair."""
    a = oracle.polar_gate(scan_pair[0], OFFLINE_GATE)
    b = oracle.polar_gate(scan_pair[1], OFFLINE_GATE)
    cfg = IcpConfig(threshold_mm=200.0, voxel_size_mm=20.0)

    src = oracle.voxel_downsample(b, cfg.voxel_size_mm)
    ref_pose, ref_rmse = oracle.icp(src, a, np.zeros(3), cfg)

    n = 512
    sxy = np.zeros((n, 2), np.float32)
    sxy[: len(src)] = src
    sv = np.zeros(n, bool)
    sv[: len(src)] = True
    txy = np.zeros((n, 2), np.float32)
    txy[: len(a)] = a
    tv = np.zeros(n, bool)
    tv[: len(a)] = True
    res = icp_masked(jnp.asarray(sxy), jnp.asarray(sv), jnp.asarray(txy), jnp.asarray(tv), jnp.zeros(3, jnp.float32), cfg)

    assert np.isfinite(ref_rmse)
    assert abs(float(res.rmse) - ref_rmse) < 1.5
    assert abs(float(res.pose[2]) - ref_pose[2]) < 5e-3
    np.testing.assert_allclose(np.asarray(res.pose[:2]), ref_pose[:2], atol=15.0)


def test_gicp_parity_contract(scan_pair):
    """`gicp(points1, points2)` signature parity (`gicp_lidar.py:12-36`):
    returns (rmse, 4x4), and registers the gated golden pair successfully."""
    a = oracle.polar_gate(scan_pair[0], OFFLINE_GATE)
    b = oracle.polar_gate(scan_pair[1], OFFLINE_GATE)
    rmse, t44 = gicp(b, a, threshold=200.0, voxel_size=20.0)
    assert t44.shape == (4, 4)
    assert np.isfinite(rmse) and rmse < 100.0
    # rotation block orthonormal
    r = t44[:2, :2]
    np.testing.assert_allclose(r @ r.T, np.eye(2), atol=1e-5)


def test_gicp_too_few_points():
    rmse, t44 = gicp(np.zeros((3, 2)), np.zeros((100, 2)))
    assert rmse == float("inf")
    np.testing.assert_array_equal(t44, np.eye(4))


def test_local_covariances_wall_direction(rng):
    """Points on a wall get a covariance whose principal axis is the wall
    tangent with the Segal (1, eps) eigenvalue regularisation."""
    from icp_slam_yolo_tpu.ops.nn import local_covariances

    n = 64
    xy = np.zeros((n, 2), np.float32)
    xy[:48, 0] = np.linspace(0, 2000, 48)  # wall along +x
    xy[:48, 1] = rng.normal(size=48) * 1.0
    valid = np.zeros(n, bool)
    valid[:48] = True
    cov = np.asarray(local_covariances(jnp.asarray(xy), jnp.asarray(valid), k=8, epsilon=1e-3))
    mid = cov[20]
    evals, evecs = np.linalg.eigh(mid)
    assert abs(evals[1] - 1.0) < 1e-4 and abs(evals[0] - 1e-3) < 1e-4
    assert abs(evecs[0, 1]) > 0.99  # principal axis ~ x
    # padded slots are identity
    np.testing.assert_allclose(cov[60], np.eye(2), atol=1e-6)


def test_knn_indices_chunked_matches_direct(rng):
    """Row-chunked k-NN equals a brute-force reference, across tile edges."""
    from icp_slam_yolo_tpu.ops.nn import knn_indices

    m = 100
    xy = rng.normal(size=(m, 2)).astype(np.float32) * 1000.0
    valid = rng.random(m) > 0.2
    idx, ok = knn_indices(jnp.asarray(xy), jnp.asarray(valid), k=5, row_tile=32)
    d = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
    d[np.eye(m, dtype=bool)] = np.inf
    d[:, ~valid] = np.inf
    ref = np.argsort(d, axis=1)[:, :5]
    for i in range(m):
        assert ok[i].all() == (valid.sum() - valid[i] >= 5) or not valid.any()
        np.testing.assert_allclose(
            np.sort(d[i, np.asarray(idx[i])[np.asarray(ok[i])]]),
            np.sort(d[i, ref[i][: int(np.asarray(ok[i]).sum())]]),
            rtol=1e-5,
        )


def test_gicp_estimator_recovers_transform(rng):
    """Covariance-weighted GICP recovers a known transform on corridor-like
    geometry (two parallel walls — where isotropic p2p is weakly constrained
    along the corridor axis)."""
    n = 120
    wall1 = np.stack([np.linspace(0, 6000, n), np.zeros(n)], axis=1)
    wall2 = np.stack([np.linspace(0, 6000, n), np.full(n, 1800.0)], axis=1)
    cross = np.stack([np.zeros(24), np.linspace(0, 1800, 24)], axis=1)
    tgt = np.concatenate([wall1, wall2, cross]) + rng.normal(size=(2 * n + 24, 2)) * 3.0
    theta, t = 0.025, np.array([80.0, -30.0])
    src = (tgt - t) @ _rot(theta)
    cfg = IcpConfig(threshold_mm=500.0, estimator="gicp", max_iterations=50)
    res = icp(src, tgt, cfg=cfg)
    assert abs(float(res.pose[2]) - theta) < 5e-3
    np.testing.assert_allclose(np.asarray(res.pose[:2]), t, atol=12.0)
    assert float(res.rmse) < 15.0


def test_gicp_estimator_golden_pair(scan_pair):
    """GICP on the reference's demo pair lands near the p2p/oracle solution."""
    a = oracle.polar_gate(scan_pair[0], OFFLINE_GATE)
    b = oracle.polar_gate(scan_pair[1], OFFLINE_GATE)
    cfg = IcpConfig(threshold_mm=200.0, voxel_size_mm=20.0)
    src = oracle.voxel_downsample(b, cfg.voxel_size_mm)
    ref_pose, ref_rmse = oracle.icp(src, a, np.zeros(3), cfg)

    res = icp(src, a, cfg=IcpConfig(threshold_mm=200.0, estimator="gicp"))
    assert np.isfinite(float(res.rmse)) and float(res.rmse) < ref_rmse + 5.0
    assert abs(float(res.pose[2]) - ref_pose[2]) < 2e-2
    np.testing.assert_allclose(np.asarray(res.pose[:2]), ref_pose[:2], atol=40.0)


def test_point_to_plane_estimator(rng):
    """point-to-plane converges on structured (wall-like) scenes."""
    wall1 = np.stack([np.linspace(0, 5000, 150), np.zeros(150)], axis=1)
    wall2 = np.stack([np.zeros(150), np.linspace(0, 4000, 150)], axis=1)
    tgt = np.concatenate([wall1, wall2]) + rng.normal(size=(300, 2)) * 2.0
    theta, t = 0.03, np.array([40.0, -25.0])
    src = (tgt - t) @ _rot(theta)
    cfg = IcpConfig(threshold_mm=500.0, estimator="point_to_plane")
    res = icp(src, tgt, cfg=cfg)
    assert abs(float(res.pose[2]) - theta) < 5e-3
    np.testing.assert_allclose(np.asarray(res.pose[:2]), t, atol=10.0)


def test_anderson_same_fixpoint_fewer_iterations(scan_pair):
    """Anderson(1) acceleration (AA-ICP, arxiv 1709.05479) must converge to
    the same registration in strictly fewer iterations on the reference's
    golden pair — both the XLA path and the fused kernel (interpret here)."""
    a, b = scan_pair
    src = oracle.voxel_downsample(oracle.polar_gate(b, OFFLINE_GATE), 20.0)
    tgt = oracle.polar_gate(a, OFFLINE_GATE)
    for backend in ("xla", "fused"):
        base = icp(src, tgt, cfg=IcpConfig(backend=backend, max_iterations=100))
        fast = icp(src, tgt, cfg=IcpConfig(backend=backend, max_iterations=100, anderson=True))
        assert int(fast.n_iters) < int(base.n_iters), (backend, int(fast.n_iters), int(base.n_iters))
        np.testing.assert_allclose(np.asarray(fast.pose), np.asarray(base.pose), atol=0.05)
        assert abs(float(fast.rmse) - float(base.rmse)) < 0.1


def test_anderson_known_transform(rng):
    theta = np.radians(10.0)
    t = np.array([150.0, 80.0])
    tgt = rng.normal(size=(300, 2)) * 3000.0
    src = (tgt - t) @ _rot(theta)
    res = icp(src, tgt, cfg=IcpConfig(threshold_mm=500.0, max_iterations=50, anderson=True))
    assert abs(float(res.pose[2]) - theta) < 2e-3
    np.testing.assert_allclose(np.asarray(res.pose[:2]), t, atol=10.0)
