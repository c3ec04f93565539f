"""End-to-end pipeline regression: compiled lax.scan replay vs the NumPy oracle
on a real Scan_data_1 prefix (the reference's offline replay is its de-facto
integration test, SURVEY.md section 4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_slam_yolo_tpu.config import SlamConfig
from icp_slam_yolo_tpu.io import scans as scans_io
from icp_slam_yolo_tpu.reference_impl import oracle
from icp_slam_yolo_tpu.slam import pipeline
from icp_slam_yolo_tpu.slam.api import Slam

CFG = SlamConfig(map_capacity=4096)


@pytest.mark.slow  # >90 s integration/parity job; the full-replay quality gate
# (scripts/quality_check.py) covers the same property on the complete dataset
def test_run_sequence_matches_oracle(scan_sequence):
    """f32 compiled pipeline vs float64 NumPy oracle, 200-scan prefix.

    Error budget (measured 2026-08-17, CPU backend; identical bounds hold on
    TPU where geometry runs f32 off the MXU / precision=HIGHEST inside it):
      * accept agreement 200/200 — asserted >= 0.99 (>= 198/200);
      * position divergence max 21.9 mm (p99 14.1, median 3.0) — the drift
        source is f32 NN tie-breaking: near-equidistant map points can match
        differently than float64, shifting the converged pose a few mm per
        scan, compounding through map insertion (not a per-op rounding issue:
        single-registration parity vs the oracle is <= 0.2 mm,
        test_registration.py);
      * angle divergence max 7.1e-3 rad; rmse divergence max 7.2 mm, driven
        by the same correspondence flips on high-residual (near-gate) scans.
    """
    del scan_sequence  # fixture only holds 60 scans; this test needs 200
    paths = scans_io.sequence_paths("/root/reference/Scan_data_1", 1, 201)
    raw = [np.load(p) for p in paths]
    padded = scans_io.collate(raw, CFG.n_max)

    _, ref_poses, ref_rmses, ref_acc = oracle.run_sequence(raw, CFG)
    state, outs = pipeline.run_sequence(jnp.asarray(padded), CFG)

    acc = np.asarray(outs.accepted)
    poses = np.asarray(outs.pose)
    rmses = np.asarray(outs.rmse)

    agree = (acc == ref_acc).mean()
    assert agree >= 0.99, f"accept agreement {agree}"

    both = acc & ref_acc
    assert both.sum() > 150
    pos_err = np.linalg.norm(poses[both, :2] - ref_poses[both, :2], axis=1)
    ang_err = np.abs(poses[both, 2] - ref_poses[both, 2])
    assert pos_err.max() < 30.0, f"max position error {pos_err.max():.2f} mm"
    assert ang_err.max() < 0.02, f"max angle error {ang_err.max():.4f} rad"
    finite = np.isfinite(rmses) & np.isfinite(ref_rmses)
    assert np.abs(rmses[finite] - ref_rmses[finite]).max() < 10.0


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_streaming_equals_batch(scan_sequence):
    raw = scan_sequence[:15]
    padded = scans_io.collate(raw, CFG.n_max)

    s = Slam(CFG)
    for scan in raw:
        s.add_scan(scan)
    stream_traj = np.asarray(s.trajectory)

    _, outs = pipeline.run_sequence(jnp.asarray(padded), CFG)
    batch_traj = np.concatenate([np.zeros((1, 3)), np.asarray(outs.pose)], axis=0)
    np.testing.assert_allclose(stream_traj, batch_traj, atol=1e-3)


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_map_stays_bounded(scan_sequence):
    padded = scans_io.collate(scan_sequence[:30], CFG.n_max)
    state, _ = pipeline.run_sequence(jnp.asarray(padded), CFG)
    n = int(np.asarray(state.map_valid).sum())
    assert 50 < n <= CFG.map_capacity
    occ = np.asarray(state.occ)
    assert occ.min() >= 0.0 and occ.max() <= 1.0
    assert (occ != 0.5).sum() > 100  # the grid actually got painted


def test_update_map_api(scan_sequence):
    padded = scans_io.collate(scan_sequence[:1], CFG.n_max)
    state = pipeline.init_state(jnp.asarray(padded[0]), CFG)
    n0 = int(np.asarray(state.map_valid).sum())
    state2 = pipeline.update_map(state, padded[0], np.array([500.0, 0.0, 0.1]), CFG)
    assert int(np.asarray(state2.map_valid).sum()) > n0
    np.testing.assert_allclose(np.asarray(state2.pose), [500.0, 0.0, 0.1], atol=1e-5)


def test_reject_leaves_state_unchanged(scan_sequence):
    padded = scans_io.collate(scan_sequence[:2], CFG.n_max)
    state = pipeline.init_state(jnp.asarray(padded[0]), CFG)
    step = pipeline.make_step(CFG)
    garbage = np.zeros((CFG.n_max, 3), np.float32)  # all rows fail the gates
    new_state, out = step(state, jnp.asarray(garbage))
    assert not bool(out.accepted)
    np.testing.assert_array_equal(np.asarray(new_state.pose), np.asarray(state.pose))
    np.testing.assert_array_equal(np.asarray(new_state.map_valid), np.asarray(state.map_valid))
    assert int(new_state.step) == int(state.step) + 1


def _synth_scan(radius_fn, n=280):
    """Synthetic polar scan rows [quality, angle_deg, distance_mm]."""
    ang = np.linspace(0.0, 359.0, n)
    dist = radius_fn(np.deg2rad(ang))
    return np.stack([np.full(n, 20.0), ang, dist], axis=1)


def test_reseed_recovers_from_poisoned_seed():
    """`reseed_after_rejects`: a seed scan from a disjoint geometry rejects
    every subsequent scan until the reseed rebuilds the map from the live
    stream (scan_data_3's stale scan_0 in miniature).  Oracle agrees."""
    from icp_slam_yolo_tpu.config import MapConfig

    cfg = SlamConfig(
        map=MapConfig(width_mm=12000.0, height_mm=12000.0),
        map_capacity=2048,
        reseed_after_rejects=3,
    )
    room_a = _synth_scan(lambda t: 3000.0 + 500.0 * np.cos(3 * t))
    room_b = _synth_scan(lambda t: 1800.0 + 700.0 * np.sin(2 * t + 1.0))
    seq = [room_a] + [room_b] * 8
    padded = scans_io.collate(seq, cfg.n_max)
    state, outs = pipeline.run_sequence(jnp.asarray(padded), cfg)
    acc = np.asarray(outs.accepted)
    assert not acc[:3].any(), "disjoint geometry must reject"
    assert acc[3:].all(), "post-reseed scans must register to the reseeded map"
    # reseeded map is room_b's geometry: a fresh room_b registers at ~zero error
    rm = np.asarray(outs.rmse)
    assert rm[-1] < 5.0

    _, _, _, oacc = oracle.run_sequence(padded.astype(np.float64), cfg)
    np.testing.assert_array_equal(acc, oacc)


@pytest.mark.slow  # >90 s integration/parity job; the full-replay quality gate
# (scripts/quality_check.py) covers the same property on the complete dataset
def test_windowed_prune_matches_full_grid(scan_sequence):
    """`prune_window_margin_px`: occupancy only mutates inside the raster
    window and offline prunes every accepted step, so a margined window check
    must reproduce the full-grid prune (up to the documented downsample-merge
    edge case, which does not fire on this prefix)."""
    import dataclasses

    from icp_slam_yolo_tpu.config import OccupancyConfig

    padded = scans_io.collate(scan_sequence, CFG.n_max)
    full = CFG
    windowed = CFG.replace(
        occupancy=dataclasses.replace(OccupancyConfig(), prune_window_margin_px=32)
    )
    _, outs_f = pipeline.run_sequence(jnp.asarray(padded), full)
    _, outs_w = pipeline.run_sequence(jnp.asarray(padded), windowed)
    np.testing.assert_array_equal(np.asarray(outs_f.accepted), np.asarray(outs_w.accepted))
    dp = np.abs(np.asarray(outs_f.pose) - np.asarray(outs_w.pose))
    assert dp[:, :2].max() < 1.0, f"windowed prune shifted the trajectory {dp[:, :2].max():.3f} mm"
