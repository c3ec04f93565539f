"""Collaborative shared-map fleet: psum occupancy merge + all_gather inserts.

Two robots on a 2-device mesh replay interleaved halves of the same real
Scan_data_1 stream; registering against the ONE shared map, both must track
the trajectory the sequential engine produces from the full stream.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map  # jax >= 0.8 (check_vma kw; older jax had
# jax.experimental.shard_map with check_rep)

import icp_slam_yolo_tpu as slam
from icp_slam_yolo_tpu.io import scans as scans_io
from icp_slam_yolo_tpu.parallel.mesh import make_mesh
from icp_slam_yolo_tpu.parallel.shared import _merge_occupancy, shared_fleet_run

N_SCANS = 120


def _cfg():
    return slam.REALTIME_CONFIG.replace(
        map_capacity=4096, local_map_capacity=4096, reseed_after_rejects=0
    )


def test_merge_occupancy_commutative_and_disjoint():
    """Disjoint per-robot updates both land; the merge is order-free by
    construction (a psum of log ratios)."""
    mesh = make_mesh(2)
    base = jnp.full((4, 8), 0.5, jnp.float32)
    per_robot = np.tile(np.asarray(base)[None], (2, 1, 1))
    per_robot[0, 0, 0] = 0.45   # robot 0: free-decay on cell (0,0)
    per_robot[1, 1, 1] = 0.7    # robot 1: endpoint hit on cell (1,1)

    merged = shard_map(
        lambda b, pr: _merge_occupancy(b, pr[0], "data"),
        mesh=mesh, in_specs=(P(), P("data")), out_specs=P(), check_vma=False,
    )(base, jnp.asarray(per_robot))
    merged = np.asarray(merged)
    assert abs(merged[0, 0] - 0.45) < 1e-5
    assert abs(merged[1, 1] - 0.7) < 1e-5
    assert abs(merged[2, 2] - 0.5) < 1e-6  # untouched cells stay at the prior


def test_merge_occupancy_overlapping_is_product_of_ratios():
    mesh = make_mesh(2)
    base = jnp.full((2, 2), 0.5, jnp.float32)
    per_robot = np.full((2, 2, 2), 0.5, np.float32)
    per_robot[:, 0, 0] = 0.45  # BOTH robots decay the same cell by 0.9
    merged = shard_map(
        lambda b, pr: _merge_occupancy(b, pr[0], "data"),
        mesh=mesh, in_specs=(P(), P("data")), out_specs=P(), check_vma=False,
    )(base, jnp.asarray(per_robot))
    assert abs(float(merged[0, 0]) - 0.5 * 0.9 * 0.9) < 1e-5


@pytest.fixture(scope="module")
def real_scans():
    scans, counts, paths = scans_io.load_sequence(
        "/root/reference/Scan_data_1", 1, N_SCANS + 1, n_max=512
    )
    if len(paths) < N_SCANS:
        pytest.skip("reference scan data unavailable")
    return np.asarray(scans)


@pytest.mark.slow  # >90 s integration/parity job; the full-replay quality gate
# (scripts/quality_check.py) covers the same property on the complete dataset
def test_shared_fleet_tracks_like_sequential(real_scans):
    cfg = _cfg()
    # interleave: robot A gets even scans, robot B odd — both must rely on the
    # SHARED map for the geometry its peer observed
    a, b = real_scans[0::2], real_scans[1::2]
    t = min(len(a), len(b))
    stack = np.stack([a[:t], b[:t]])  # (2, T, n, 3)

    mesh = make_mesh(2)
    map_xy, map_valid, occ, poses, outs = shared_fleet_run(
        jnp.asarray(stack), cfg, mesh=mesh
    )

    acc = np.asarray(outs.accepted)
    assert acc.shape == (2, t - 1)
    # both robots must track on the shared map (warmup rejects allowed)
    assert acc[:, 5:].mean() > 0.85, f"shared-map acceptance {acc[:, 5:].mean():.3f}"

    # the shared map is replicated and genuinely fused: it must out-populate
    # what either robot alone could have inserted from its half-rate stream
    n_live = int(np.asarray(map_valid).sum())
    assert 500 < n_live <= cfg.map_capacity

    o = np.asarray(occ)
    assert o.min() > 0.0 and o.max() <= 1.0
    assert (o < 0.3).any() and (o > 0.6).any()  # free space carved + walls hit

    # trajectories: compare against the sequential engine on the full stream
    eng = slam.Slam(cfg)
    _, souts = eng.run(real_scans)
    seq_poses = np.asarray(souts.pose)  # (N_SCANS-1, 3) for scans 1..N-1
    shared_poses = np.asarray(outs.pose)  # (2, t-1, 3)
    # robot A's k-th processed scan is global scan index 2k+2 -> sequential row 2k+1
    for robot, offset in ((0, 1), (1, 2)):
        for k in range(10, t - 1, 20):
            seq_idx = 2 * k + offset
            if seq_idx >= len(seq_poses):
                break
            d = np.linalg.norm(shared_poses[robot, k, :2] - seq_poses[seq_idx, :2])
            assert d < 300.0, f"robot {robot} scan {k}: {d:.0f} mm from sequential"


def test_shared_fleet_rejects_wrong_robot_count(real_scans):
    cfg = _cfg()
    stack = np.stack([real_scans[:4]] * 4)
    with pytest.raises(ValueError, match="one robot per device"):
        shared_fleet_run(jnp.asarray(stack), cfg, mesh=make_mesh(2))
