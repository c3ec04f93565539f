"""Realtime-semantics pipeline (`mainn.py:267-399`) vs the NumPy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from icp_slam_yolo_tpu.config import REALTIME_CONFIG
from icp_slam_yolo_tpu.io import scans as scans_io
from icp_slam_yolo_tpu.reference_impl import oracle
from icp_slam_yolo_tpu.slam import pipeline

CFG = REALTIME_CONFIG.replace(map_capacity=4096)


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_realtime_matches_oracle(scan_sequence):
    raw = scan_sequence[:35]
    padded = scans_io.collate(raw, CFG.n_max)

    _, ref_poses, ref_rmses, ref_acc = oracle.run_sequence_realtime(raw, CFG)
    state, outs = pipeline.run_sequence(jnp.asarray(padded), CFG)

    acc = np.asarray(outs.accepted)
    poses = np.asarray(outs.pose)
    agree = (acc == ref_acc).mean()
    assert agree > 0.9, f"accept agreement {agree}"

    both = acc & ref_acc
    assert both.sum() > 10
    pos_err = np.linalg.norm(poses[both, :2] - ref_poses[both, :2], axis=1)
    assert pos_err.max() < 30.0, f"max position error {pos_err.max():.2f} mm"


def test_realtime_reject_keeps_pose_and_updates_occupancy():
    # synthetic state: a wall of map points at x = 2000
    wall = np.zeros((CFG.n_max, 3), np.float32)
    wall[:80, 0] = 30.0
    ang = np.linspace(-30, 30, 80) % 360
    wall[:80, 1] = ang
    wall[:80, 2] = 2000.0 / np.cos(np.deg2rad(np.where(ang > 180, ang - 360, ang)))
    state = pipeline.init_state(jnp.asarray(wall), CFG)
    step = pipeline.make_step(CFG)
    state, out1 = step(state, jnp.asarray(wall))  # seeds prev_xy
    assert bool(out1.accepted)
    occ_before = np.asarray(state.occ).copy()
    pose_before = np.asarray(state.pose).copy()

    # every point ~6.5 m from any map point: passes the gates (valid range)
    # but can never find a correspondence within 180 mm -> rejected
    far = np.zeros((CFG.n_max, 3), np.float32)
    far[:50, 0] = 30.0
    far[:50, 1] = np.linspace(0, 20, 50)
    far[:50, 2] = 8500.0
    state2, out2 = step(state, jnp.asarray(far))
    assert not bool(out2.accepted)
    np.testing.assert_array_equal(np.asarray(state2.pose), pose_before)
    # previous points re-rasterised (`mainn.py:333-340`): occupancy changed
    assert (np.asarray(state2.occ) != occ_before).any()
    assert int(state2.maint_count) == int(state.maint_count) + 1


def test_maintenance_counter_skips_empty_scans(scan_sequence):
    padded = scans_io.collate(scan_sequence[:2], CFG.n_max)
    state = pipeline.init_state(jnp.asarray(padded[0]), CFG)
    step = pipeline.make_step(CFG)
    garbage = jnp.zeros((CFG.n_max, 3), jnp.float32)
    state2, out = step(state, garbage)
    assert int(state2.step) == 1
    assert int(state2.maint_count) == 0  # skipped scans don't advance maintenance
