"""Occupancy raster: vectorised Bresenham vs the literal reference algorithm,
and the full update vs the NumPy oracle."""

import jax
import numpy as np
import jax.numpy as jnp

from icp_slam_yolo_tpu.config import MapConfig, OccupancyConfig
from icp_slam_yolo_tpu.ops.raster import bresenham_cells, occupancy_keep_mask, update_occupancy, world_to_px
from icp_slam_yolo_tpu.reference_impl import oracle


def test_bresenham_closed_form_exact(rng):
    """Every ray's cell sequence must equal the reference Python Bresenham
    (`process.py:86-112`) bit for bit."""
    x0, y0 = 50, 40
    ends = rng.integers(-100, 140, size=(200, 2))
    cells = bresenham_cells(
        jnp.int32(x0), jnp.int32(y0), jnp.asarray(ends[:, 0], jnp.int32), jnp.asarray(ends[:, 1], jnp.int32),
        jnp.ones(len(ends), bool), 256,
    )
    px, py = np.asarray(cells.px), np.asarray(cells.py)
    body, endp = np.asarray(cells.body), np.asarray(cells.endpoint)
    for r, (x1, y1) in enumerate(ends):
        ref = oracle.bresenham(x0, y0, int(x1), int(y1))
        n = body[r].sum() + endp[r].sum()
        assert n == len(ref), f"ray {r}: {n} vs {len(ref)}"
        ours = list(zip(px[r][: len(ref)], py[r][: len(ref)]))
        assert ours == ref, f"ray {r} differs"
        # endpoint flag on the last cell only
        assert endp[r].argmax() == len(ref) - 1


def test_world_to_px_convention():
    mc = MapConfig()
    px, py = world_to_px(jnp.asarray([[0.0, 0.0], [3000.0, -3000.0]], jnp.float32), mc)
    assert (int(px[0]), int(py[0])) == (500, 416)
    assert (int(px[1]), int(py[1])) == (600, 516)


def test_update_occupancy_matches_oracle(scan_pair):
    from icp_slam_yolo_tpu.config import OFFLINE_GATE

    mc, oc = MapConfig(), OccupancyConfig()
    pts = oracle.polar_gate(scan_pair[0], OFFLINE_GATE)
    occ0 = np.full((mc.height_px, mc.width_px), 0.5, np.float64)

    ref = oracle.update_occupancy(occ0, pts, np.zeros(2), mc, oc)
    # second scan exercises the frozen-probability early stop
    ref2 = oracle.update_occupancy(ref, pts + 30.0, np.array([50.0, 20.0]), mc, oc)

    n = 512
    xy = np.zeros((n, 2), np.float32)
    xy[: len(pts)] = pts
    valid = np.zeros(n, bool)
    valid[: len(pts)] = True
    ours = update_occupancy(jnp.full((mc.height_px, mc.width_px), 0.5, jnp.float32), jnp.asarray(xy), jnp.asarray(valid), jnp.zeros(2, jnp.float32), mc, oc)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    xy2 = np.zeros((n, 2), np.float32)
    xy2[: len(pts)] = pts + 30.0
    ours2 = update_occupancy(ours, jnp.asarray(xy2), jnp.asarray(valid), jnp.asarray([50.0, 20.0], jnp.float32), mc, oc)
    np.testing.assert_allclose(np.asarray(ours2), ref2, atol=1e-5)


def test_early_stop_blocks_ray():
    mc = MapConfig(width_mm=3000.0, height_mm=3000.0, resolution_mm_per_px=30.0)
    oc = OccupancyConfig(window_px=49)
    h, w = mc.height_px, mc.width_px
    occ = np.full((h, w), 0.5, np.float32)
    # wall of occupied cells across the ray path at x = +300mm (px 60)
    occ[:, 60] = 0.9
    endpoint = np.asarray([[900.0, 0.0]], np.float32)  # px 80, beyond the wall
    out = update_occupancy(jnp.asarray(occ), jnp.asarray(endpoint), jnp.ones(1, bool), jnp.zeros(2, jnp.float32), mc, oc)
    out = np.asarray(out)
    ry, rx = mc.center_px[1], mc.center_px[0]
    assert out[ry, rx + 5] < 0.5          # decayed before the wall
    assert out[ry, 60] == np.float32(0.9)  # the blocking cell untouched
    assert out[ry, rx + 15] == 0.5         # beyond the wall: untouched
    assert out[ry, 80] == 0.5              # endpoint not incremented (ray blocked)


def test_occupancy_keep_mask():
    mc = MapConfig()
    occ = jnp.full((mc.height_px, mc.width_px), 0.5, jnp.float32).at[416, 600].set(0.05)
    pts = jnp.asarray([[3000.0, 0.0], [0.0, 3000.0], [10**6, 0.0]], jnp.float32)
    keep = occupancy_keep_mask(pts, jnp.ones(3, bool), occ, mc, 0.2)
    assert list(np.asarray(keep)) == [False, True, True]  # free cell dropped, OOB kept


def test_prune_keep_mask_windowed_matches_full():
    """With a margin, points inside the expanded window get the exact check
    and points outside are kept; agrees with the oracle's windowed variant."""
    import dataclasses

    from icp_slam_yolo_tpu.ops.raster import prune_keep_mask

    mc = MapConfig()
    oc = dataclasses.replace(OccupancyConfig(), prune_window_margin_px=32)
    occ = np.full((mc.height_px, mc.width_px), 0.5, np.float32)
    occ[416, 600] = 0.05      # free cell inside the window (robot at origin)
    occ[100, 100] = 0.05      # free cell far outside the window
    pts = np.asarray(
        [[3000.0, 0.0],                     # inside window, free cell -> drop
         [0.0, 3000.0],                     # inside window, unknown -> keep
         [(100 - 500) * 30.0, (416 - 100) * 30.0],  # outside window, free -> KEPT (windowed)
         [10.0**6, 0.0]],                   # grid OOB -> keep
        np.float32)
    robot = np.zeros(2, np.float32)
    keep = prune_keep_mask(jnp.asarray(pts), jnp.ones(4, bool), jnp.asarray(occ), jnp.asarray(robot), mc, oc)
    assert list(np.asarray(keep)) == [False, True, True, True]
    ref = oracle.prune_keep_mask(pts.astype(np.float64), occ.astype(np.float64), robot.astype(np.float64), mc, oc)
    assert list(np.asarray(keep)) == list(ref)
    # full-grid mode drops the far free-cell point too
    oc_full = dataclasses.replace(oc, prune_window_margin_px=-1)
    keep_full = prune_keep_mask(jnp.asarray(pts), jnp.ones(4, bool), jnp.asarray(occ), jnp.asarray(robot), mc, oc_full)
    assert list(np.asarray(keep_full)) == [False, True, False, True]


def test_update_occupancy_at_map_border(scan_pair):
    """Robot near the map corner: the clamped-origin window and edge-shrunk
    reference window must still agree (exercises the one-hot matmul paths
    with clipped sample coordinates)."""
    from icp_slam_yolo_tpu.config import OFFLINE_GATE

    mc, oc = MapConfig(), OccupancyConfig()
    pts = oracle.polar_gate(scan_pair[0], OFFLINE_GATE)
    # place the robot ~10 px from the top-left map corner (world coords)
    corner = np.array(
        [-(mc.width_mm / 2) + 10 * mc.resolution_mm_per_px,
         (mc.height_mm / 2) - 10 * mc.resolution_mm_per_px])
    pts_c = pts * 0.2 + corner  # shrink the scan so some endpoints stay in-map
    occ0 = np.full((mc.height_px, mc.width_px), 0.5, np.float64)
    ref = oracle.update_occupancy(occ0, pts_c, corner, mc, oc)

    n = 512
    xy = np.zeros((n, 2), np.float32)
    xy[: len(pts_c)] = pts_c
    valid = np.zeros(n, bool)
    valid[: len(pts_c)] = True
    ours = update_occupancy(
        jnp.full((mc.height_px, mc.width_px), 0.5, jnp.float32),
        jnp.asarray(xy), jnp.asarray(valid), jnp.asarray(corner, jnp.float32), mc, oc,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_update_occupancy_odd_ray_count(scan_pair):
    """Ray buffers that are not a multiple of the 128-ray block (and scattered
    validity, which ray compaction must repack) still match the oracle."""
    from icp_slam_yolo_tpu.config import OFFLINE_GATE

    mc, oc = MapConfig(), OccupancyConfig()
    pts = oracle.polar_gate(scan_pair[0], OFFLINE_GATE)[:150]
    n = 200  # not a multiple of 128
    xy = np.zeros((n, 2), np.float32)
    valid = np.zeros(n, bool)
    idx = np.arange(0, n, 2)[: len(pts)]  # scattered validity
    xy[idx] = pts[: len(idx)]
    valid[idx] = True
    occ0 = np.full((mc.height_px, mc.width_px), 0.5, np.float64)
    ref = oracle.update_occupancy(occ0, pts[: len(idx)], np.zeros(2), mc, oc)
    ours = update_occupancy(
        jnp.full((mc.height_px, mc.width_px), 0.5, jnp.float32),
        jnp.asarray(xy), jnp.asarray(valid), jnp.zeros(2, jnp.float32), mc, oc,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def _fused(oc: OccupancyConfig) -> OccupancyConfig:
    import dataclasses

    return dataclasses.replace(oc, backend="fused")


def test_fused_raster_matches_oracle(scan_pair):
    """The Pallas raster kernel (interpret mode on CPU) must reproduce the
    oracle exactly like the XLA path does."""
    from icp_slam_yolo_tpu.config import OFFLINE_GATE

    mc, oc = MapConfig(), _fused(OccupancyConfig())
    pts = oracle.polar_gate(scan_pair[0], OFFLINE_GATE)
    occ0 = np.full((mc.height_px, mc.width_px), 0.5, np.float64)
    ref = oracle.update_occupancy(occ0, pts, np.zeros(2), mc, oc)
    ref2 = oracle.update_occupancy(ref, pts + 30.0, np.array([50.0, 20.0]), mc, oc)

    n = 512
    xy = np.zeros((n, 2), np.float32)
    xy[: len(pts)] = pts
    valid = np.zeros(n, bool)
    valid[: len(pts)] = True
    ours = update_occupancy(
        jnp.full((mc.height_px, mc.width_px), 0.5, jnp.float32),
        jnp.asarray(xy), jnp.asarray(valid), jnp.zeros(2, jnp.float32), mc, oc,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)
    xy2 = np.zeros((n, 2), np.float32)
    xy2[: len(pts)] = pts + 30.0
    ours2 = update_occupancy(
        ours, jnp.asarray(xy2), jnp.asarray(valid),
        jnp.asarray([50.0, 20.0], jnp.float32), mc, oc,
    )
    np.testing.assert_allclose(np.asarray(ours2), ref2, atol=1e-5)


def test_fused_raster_at_map_border(scan_pair):
    """Corner-clamped window: fused kernel must agree with the oracle (also
    exercises wedge bboxes clipped against the window edge)."""
    from icp_slam_yolo_tpu.config import OFFLINE_GATE

    mc, oc = MapConfig(), _fused(OccupancyConfig())
    pts = oracle.polar_gate(scan_pair[0], OFFLINE_GATE)
    corner = np.array(
        [-(mc.width_mm / 2) + 10 * mc.resolution_mm_per_px,
         (mc.height_mm / 2) - 10 * mc.resolution_mm_per_px])
    pts_c = pts * 0.2 + corner
    occ0 = np.full((mc.height_px, mc.width_px), 0.5, np.float64)
    ref = oracle.update_occupancy(occ0, pts_c, corner, mc, oc)

    n = 512
    xy = np.zeros((n, 2), np.float32)
    xy[: len(pts_c)] = pts_c
    valid = np.zeros(n, bool)
    valid[: len(pts_c)] = True
    ours = update_occupancy(
        jnp.full((mc.height_px, mc.width_px), 0.5, jnp.float32),
        jnp.asarray(xy), jnp.asarray(valid), jnp.asarray(corner, jnp.float32), mc, oc,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


def test_fused_raster_odd_ray_count_and_early_stop(scan_pair):
    """Non-32-multiple ray buffers with scattered validity, plus the
    frozen-probability early stop, through the fused kernel."""
    from icp_slam_yolo_tpu.config import OFFLINE_GATE

    mc, oc = MapConfig(), _fused(OccupancyConfig())
    pts = oracle.polar_gate(scan_pair[0], OFFLINE_GATE)[:150]
    n = 200
    xy = np.zeros((n, 2), np.float32)
    valid = np.zeros(n, bool)
    idx = np.arange(0, n, 2)[: len(pts)]
    xy[idx] = pts[: len(idx)]
    valid[idx] = True
    occ0 = np.full((mc.height_px, mc.width_px), 0.5, np.float64)
    ref = oracle.update_occupancy(occ0, pts[: len(idx)], np.zeros(2), mc, oc)
    ours = update_occupancy(
        jnp.full((mc.height_px, mc.width_px), 0.5, jnp.float32),
        jnp.asarray(xy), jnp.asarray(valid), jnp.zeros(2, jnp.float32), mc, oc,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    # early stop: wall across the ray path (see test_early_stop_blocks_ray)
    mc2 = MapConfig(width_mm=12000.0, height_mm=12000.0, resolution_mm_per_px=30.0)
    oc2 = _fused(OccupancyConfig(window_px=100, max_ray_px=112))
    h, w = mc2.height_px, mc2.width_px
    occ = np.full((h, w), 0.5, np.float32)
    occ[:, mc2.center_px[0] + 10] = 0.9
    endpoint = np.asarray([[900.0, 0.0]], np.float32)  # beyond the wall
    out = np.asarray(update_occupancy(
        jnp.asarray(occ), jnp.asarray(endpoint), jnp.ones(1, bool),
        jnp.zeros(2, jnp.float32), mc2, oc2,
    ))
    ry, rx = mc2.center_px[1], mc2.center_px[0]
    assert out[ry, rx + 5] < 0.5
    assert out[ry, rx + 10] == np.float32(0.9)
    assert out[ry, rx + 15] == 0.5


def test_fused_grid_dma_matches_oracle(scan_pair):
    """DMA-window full-grid kernel path (tile-aligned grid: H % 8 == 0,
    W % 128 == 0) must reproduce the oracle, including with the robot near a
    corner (origin clipped + floored to the DMA tile grid) and batched under
    vmap (the custom_vmap batched kernel)."""
    from icp_slam_yolo_tpu.config import OFFLINE_GATE
    from icp_slam_yolo_tpu.ops.raster import _fused_grid_dims

    mc = MapConfig(width_mm=11520.0, height_mm=11520.0)  # 384 x 384 grid
    oc = _fused(OccupancyConfig(window_px=100, max_ray_px=112))
    assert _fused_grid_dims(mc.height_px, mc.width_px, oc) is not None

    pts = oracle.polar_gate(scan_pair[0], OFFLINE_GATE)
    pts = pts * 0.5  # keep rays inside the smaller arena
    n = 512
    xy = np.zeros((n, 2), np.float32)
    xy[: len(pts)] = pts
    valid = np.zeros(n, bool)
    valid[: len(pts)] = True

    for robot in (np.zeros(2), np.array([-mc.width_mm / 2 + 300.0, mc.height_mm / 2 - 300.0])):
        pts_r = pts * 0.2 + robot
        xy_r = np.zeros((n, 2), np.float32)
        xy_r[: len(pts_r)] = pts_r
        occ0 = np.full((mc.height_px, mc.width_px), 0.5, np.float64)
        ref = oracle.update_occupancy(occ0, pts_r, robot, mc, oc)
        ours = update_occupancy(
            jnp.full((mc.height_px, mc.width_px), 0.5, jnp.float32),
            jnp.asarray(xy_r), jnp.asarray(valid), jnp.asarray(robot, jnp.float32),
            mc, oc,
        )
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    # batched: two robots at different window origins in one vmapped call
    robots = np.stack([np.zeros(2), np.array([1500.0, -2000.0])]).astype(np.float32)
    xy2 = np.zeros((n, 2), np.float32)
    pts2 = pts * 0.3 + robots[1]
    xy2[: len(pts2)] = pts2
    batch_xy = jnp.asarray(np.stack([xy, xy2]))
    batch_valid = jnp.asarray(np.stack([valid, valid]))
    occb = jnp.full((2, mc.height_px, mc.width_px), 0.5, jnp.float32)
    outs = jax.vmap(lambda o, p, v, r: update_occupancy(o, p, v, r, mc, oc))(
        occb, batch_xy, batch_valid, jnp.asarray(robots)
    )
    for i, robot in enumerate(robots):
        refb = oracle.update_occupancy(
            np.full((mc.height_px, mc.width_px), 0.5, np.float64),
            np.asarray(batch_xy[i])[np.asarray(batch_valid[i])], robot, mc, oc,
        )
        np.testing.assert_allclose(np.asarray(outs[i]), refb, atol=1e-5)
