"""Unit tests: polar gating, SE(2) algebra (vs the NumPy oracle and by algebraic identity)."""

import numpy as np
import jax.numpy as jnp

from icp_slam_yolo_tpu.config import OFFLINE_GATE, REALTIME_GATE
from icp_slam_yolo_tpu.ops import geometry as geo
from icp_slam_yolo_tpu.reference_impl import oracle


def test_polar_gate_matches_oracle(scan_pair):
    for scan in scan_pair:
        for gate in (OFFLINE_GATE, REALTIME_GATE):
            xy, valid = geo.polar_to_cartesian(jnp.asarray(scan, jnp.float32), gate)
            ours = np.asarray(xy)[np.asarray(valid)]
            ref = oracle.polar_gate(scan, gate)
            assert ours.shape == ref.shape
            np.testing.assert_allclose(ours, ref, atol=0.02)  # f32 trig vs f64


def test_gate_rules():
    # rows: [quality, angle_deg, distance_mm]
    scan = jnp.asarray(
        [
            [20.0, 0.0, 5000.0],    # keep
            [5.0, 0.0, 5000.0],     # low quality
            [20.0, 180.0, 5000.0],  # behind arc
            [20.0, 0.0, 11000.0],   # too far
            [20.0, 0.0, 0.0],       # zero distance (padding-like)
            [20.0, 300.0, 2000.0],  # keep (>=225 arc)
        ]
    )
    _, valid = geo.polar_to_cartesian(scan, OFFLINE_GATE)
    assert list(np.asarray(valid)) == [True, False, False, False, False, True]


def test_polar_convention():
    # angle 90deg -> x=0, y=-d (reference `process.py:47-50`)
    scan = jnp.asarray([[20.0, 90.0, 2000.0]])
    xy, valid = geo.polar_to_cartesian(scan, OFFLINE_GATE)
    assert bool(valid[0])
    np.testing.assert_allclose(np.asarray(xy[0]), [0.0, -2000.0], atol=1e-2)


def test_realtime_variant_presets():
    from icp_slam_yolo_tpu.config import REALTIME_1_CONFIG, REALTIME_B_CONFIG

    # b.py variant: +sin convention, permissive quality gate
    scan = jnp.asarray([[6.0, 90.0, 2000.0]])
    xy, valid = geo.polar_to_cartesian(scan, REALTIME_B_CONFIG.gate)
    assert bool(valid[0])  # q=6 passes the q>5 gate
    np.testing.assert_allclose(np.asarray(xy[0]), [0.0, 2000.0], atol=1e-2)  # +sin
    assert REALTIME_B_CONFIG.map.width_px == 1000  # 20 m @ 20 mm

    # realtime_1 variant: rear points pass (no arc filter), d<5000 gate
    scan = jnp.asarray([[20.0, 180.0, 2000.0], [20.0, 0.0, 6000.0]])
    _, valid = geo.polar_to_cartesian(scan, REALTIME_1_CONFIG.gate)
    assert list(np.asarray(valid)) == [True, False]


def test_se2_roundtrip(rng):
    pose = jnp.asarray([123.0, -456.0, 0.7], jnp.float32)
    pts = jnp.asarray(rng.normal(size=(50, 2)) * 1000, jnp.float32)
    back = geo.se2_apply(geo.se2_inverse(pose), geo.se2_apply(pose, pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-2)

    m = geo.se2_to_mat44(pose)
    pose2 = geo.mat44_to_se2(m)
    np.testing.assert_allclose(np.asarray(pose2), np.asarray(pose), atol=1e-5)


def test_se2_compose_matches_matmul(rng):
    a = jnp.asarray([10.0, 20.0, 0.3], jnp.float32)
    b = jnp.asarray([-5.0, 7.0, -1.1], jnp.float32)
    ab = geo.se2_compose(a, b)
    m = np.asarray(geo.se2_to_mat44(a)) @ np.asarray(geo.se2_to_mat44(b))
    np.testing.assert_allclose(np.asarray(geo.se2_to_mat44(ab)), m, atol=1e-4)


def test_se2_extrapolate():
    from icp_slam_yolo_tpu.ops.geometry import se2_compose, se2_extrapolate, se2_inverse

    prev = jnp.asarray([0.0, 0.0, 0.0])
    pose = jnp.asarray([10.0, 0.0, 0.1])
    pred = se2_extrapolate(pose, prev)
    # manual: delta = pose o prev^-1 = pose; pred = pose o pose
    manual = se2_compose(pose, pose)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(manual), atol=1e-5)
    # stationary robot: prediction degenerates to the static init
    same = se2_extrapolate(pose, pose)
    np.testing.assert_allclose(np.asarray(same), np.asarray(pose), atol=1e-5)
    # inverse round-trip sanity
    np.testing.assert_allclose(
        np.asarray(se2_compose(pose, se2_inverse(pose))), [0, 0, 0], atol=1e-5
    )
