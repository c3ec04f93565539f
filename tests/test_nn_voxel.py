"""Masked NN and voxel downsample vs SciPy/NumPy oracles."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial import KDTree

from icp_slam_yolo_tpu.ops.nn import knn_mean_distance, nearest_neighbor
from icp_slam_yolo_tpu.ops.outliers import dynamic_points_mask, statistical_outlier_mask
from icp_slam_yolo_tpu.ops.voxel import compact, voxel_downsample
from icp_slam_yolo_tpu.reference_impl import oracle


def test_nn_matches_kdtree(rng):
    src = rng.normal(size=(200, 2)) * 3000
    tgt = rng.normal(size=(300, 2)) * 3000
    sv = np.ones(200, bool)
    tv = np.ones(300, bool)
    dist, idx = nearest_neighbor(jnp.asarray(src, jnp.float32), jnp.asarray(tgt, jnp.float32), jnp.asarray(tv), jnp.asarray(sv))
    ref_d, ref_i = KDTree(tgt).query(src)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(np.asarray(dist), ref_d, rtol=1e-4, atol=0.05)


def test_nn_respects_target_mask(rng):
    src = np.zeros((4, 2))
    tgt = np.array([[1.0, 0.0], [0.1, 0.0], [5.0, 5.0]])
    tv = np.array([True, False, True])  # the closest target is masked out
    dist, idx = nearest_neighbor(jnp.asarray(src, jnp.float32), jnp.asarray(tgt, jnp.float32), jnp.asarray(tv))
    assert all(np.asarray(idx) == 0)
    np.testing.assert_allclose(np.asarray(dist), np.ones(4), atol=1e-3)


def test_voxel_downsample_matches_oracle(scan_pair):
    pts = oracle.polar_gate(scan_pair[0], __import__("icp_slam_yolo_tpu.config", fromlist=["OFFLINE_GATE"]).OFFLINE_GATE)
    n = 512
    xy = np.zeros((n, 2), np.float32)
    xy[: len(pts)] = pts
    valid = np.zeros(n, bool)
    valid[: len(pts)] = True
    out, ov = voxel_downsample(jnp.asarray(xy), jnp.asarray(valid), 20.0)
    ours = np.asarray(out)[np.asarray(ov)]
    ref = oracle.voxel_downsample(pts, 20.0)
    assert len(ours) == len(ref)
    # both are key-sorted, so rows must align
    np.testing.assert_allclose(ours, ref, atol=0.05)


def test_voxel_downsample_merges(rng):
    xy = np.array([[1.0, 1.0], [5.0, 8.0], [100.0, 100.0]], np.float32)  # first two share a 20mm voxel
    valid = np.ones(3, bool)
    out, ov = voxel_downsample(jnp.asarray(xy), jnp.asarray(valid), 20.0)
    got = np.asarray(out)[np.asarray(ov)]
    assert len(got) == 2
    np.testing.assert_allclose(got[0], [3.0, 4.5], atol=1e-4)


def test_compact():
    xy = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    valid = jnp.asarray([False, True, False, True, True, False])
    cx, cv = compact(xy, valid, 4)
    assert list(np.asarray(cv)) == [True, True, True, False]
    np.testing.assert_allclose(np.asarray(cx)[:3], [[2, 3], [6, 7], [8, 9]])


def test_dynamic_points_mask():
    cur = jnp.asarray(np.array([[0.0, 0.0], [1000.0, 0.0]]), jnp.float32)
    prev = jnp.asarray(np.array([[10.0, 0.0]]), jnp.float32)
    keep = dynamic_points_mask(cur, jnp.ones(2, bool), prev, jnp.ones(1, bool), 250.0)
    assert list(np.asarray(keep)) == [True, False]
    # empty prev -> keep everything (`process.py:77`)
    keep = dynamic_points_mask(cur, jnp.ones(2, bool), prev, jnp.zeros(1, bool), 250.0)
    assert list(np.asarray(keep)) == [True, True]


def test_statistical_outlier(rng):
    pts = rng.normal(size=(100, 2)).astype(np.float32) * 100
    pts[0] = [50000.0, 50000.0]  # gross outlier
    valid = np.ones(100, bool)
    keep = statistical_outlier_mask(jnp.asarray(pts), jnp.asarray(valid), nb_neighbors=10, std_ratio=1.5)
    keep = np.asarray(keep)
    assert not keep[0]
    assert keep[1:].mean() > 0.9


def test_voxel_downsample_batched_matches_separate():
    """The batched per-row-voxel-size downsample (one sort over (B, N)) must
    reproduce per-row `voxel_downsample` exactly — it backs the realtime
    step's fused duplicate-filter + occupancy-dedup call."""
    from icp_slam_yolo_tpu.ops.voxel import voxel_downsample, voxel_downsample_batched

    rng = np.random.default_rng(3)
    xy = jnp.asarray(rng.uniform(-5000, 5000, (3, 256, 2)), jnp.float32)
    valid = jnp.asarray(rng.random((3, 256)) < 0.8)
    sizes = (30.0, 60.0, 20.0)
    bxy, bval = voxel_downsample_batched(xy, valid, sizes)
    for i, s in enumerate(sizes):
        sx, sv = voxel_downsample(xy[i], valid[i], s)
        assert np.array_equal(np.asarray(sv), np.asarray(bval[i]))
        np.testing.assert_allclose(np.asarray(sx), np.asarray(bxy[i]), atol=1e-4)
