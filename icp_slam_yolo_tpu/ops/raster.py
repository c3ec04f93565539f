"""Occupancy-grid raycasting in XLA: vectorised exact Bresenham + scatter.

The reference walks a Python Bresenham line per endpoint and mutates a float32
probability grid cell-by-cell (`process.py:86-179`): body cells decay
``p *= 0.9``, the endpoint gets ``p = min(1, p + 0.2)``, and a ray stops early
at the first body cell whose probability is already ``>= 0.65``.  Updates are
restricted to a window around the robot, and endpoints outside that window are
skipped entirely (`process.py:129-148`).

TPU design:
  * Bresenham has a closed form: on the driving axis step ``i``, the minor
    coordinate is ``minor0 + s_minor * max(0, ceil((2*i*d_minor - d_major) /
    (2*d_major)))`` — exactly the integer error-accumulator sequence of
    `process.py:86-112`, so cell sequences match the reference bit-for-bit.
    We evaluate it for a static ``K = max_ray_px`` samples per ray and mask
    ``i > L`` (``L = max(|dx|, |dy|)``; the window bound keeps ``L <= 2*window``).
  * Early stopping is order-dependent in the reference (later rays see cells
    updated by earlier rays *within the same scan*).  We freeze the
    probabilities at scan start to compute each ray's first blocked cell, then
    apply all updates at once: free-decay as ``p * 0.9^n_crossings`` and
    occupancy as ``min(1, p + 0.2 * n_endpoints)`` (free applied before
    occupied).  The NumPy oracle (`reference_impl/oracle.py`) implements the
    same frozen-probability semantics so TPU and oracle agree bitwise-ish.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.config import MapConfig, OccupancyConfig


class RayCells(NamedTuple):
    px: jnp.ndarray        # (N, K) int32 cell x per sample
    py: jnp.ndarray        # (N, K) int32 cell y per sample
    body: jnp.ndarray      # (N, K) bool — body sample (i < L), ray valid
    endpoint: jnp.ndarray  # (N, K) bool — endpoint sample (i == L), ray valid


def world_to_px(xy: jnp.ndarray, map_cfg: MapConfig):
    """World mm -> integer pixel (reference convention `process.py:131-132`):
    ``px = cx + x/res`` , ``py = cy - y/res`` , truncated toward zero (int()).
    """
    cx, cy = map_cfg.center_px
    res = jnp.float32(map_cfg.resolution_mm_per_px)
    px = jnp.trunc(cx + xy[..., 0] / res).astype(jnp.int32)
    py = jnp.trunc(cy - xy[..., 1] / res).astype(jnp.int32)
    return px, py


def bresenham_cells(x0, y0, x1: jnp.ndarray, y1: jnp.ndarray, ray_valid: jnp.ndarray, k: int) -> RayCells:
    """Closed-form Bresenham sample grid for N rays from (x0, y0) to (x1, y1).

    Produces the exact cell sequence of `process.py:86-112` including its
    tie-break (the y-driven branch when ``dx <= dy``) and the appended endpoint.
    """
    dx = jnp.abs(x1 - x0)
    dy = jnp.abs(y1 - y0)
    sx = jnp.where(x1 >= x0, 1, -1)
    sy = jnp.where(y1 >= y0, 1, -1)
    ell = jnp.maximum(dx, dy)  # number of body cells; total cells = L + 1

    i = jnp.arange(k, dtype=jnp.int32)[None, :]           # (1, K)
    dxe = dx[:, None]
    dye = dy[:, None]

    def minor_steps(d_minor, d_major):
        dmaj = jnp.maximum(d_major, 1)
        # ceil(a / b) with floor-division: -((-a) // b)
        a = 2 * i * d_minor - d_major
        return jnp.maximum(0, -((-a) // (2 * dmaj)))

    x_driven = dxe > dye                                   # reference: `if dx > dy`
    kx = minor_steps(dye, dxe)                             # y-steps when x-driven
    ky = minor_steps(dxe, dye)                             # x-steps when y-driven
    px = jnp.where(x_driven, x0 + sx[:, None] * i, x0 + sx[:, None] * ky)
    py = jnp.where(x_driven, y0 + sy[:, None] * kx, y0 + sy[:, None] * i)

    in_ray = (i <= ell[:, None]) & ray_valid[:, None]
    body = in_ray & (i < ell[:, None])
    endpoint = in_ray & (i == ell[:, None])
    return RayCells(px=px, py=py, body=body, endpoint=endpoint)


def _fused_side(h: int, w: int, occ_cfg: OccupancyConfig) -> int:
    """Window side for the fused kernel (128-multiple, square), or 0 when the
    fused path is ineligible for these shapes."""
    side = -(-2 * occ_cfg.window_px // 128) * 128
    if side <= min(h, w) and occ_cfg.max_ray_px % 8 == 0:
        return side
    return 0


def _fused_grid_dims(h: int, w: int, occ_cfg: OccupancyConfig):
    """``(side_y, side_x)`` for the DMA-window full-grid kernel, or ``None``
    when ineligible (the XLA-windowed kernel path applies instead).

    The dynamic window origin floors to the (8, 128) DMA tile grid, so the
    window needs 7/127 cells of alignment slack beyond ``2 * window_px + 1``,
    and the grid itself must be tile-shaped — otherwise the clipped origin
    near the far edges loses alignment and rays there would silently drop.
    """
    win = occ_cfg.window_px
    bb = 128 if win <= 112 else 256  # wedge box; the window must contain it
    side_y = max(-(-(2 * win + 8) // 8) * 8, bb)
    side_x = max(-(-(2 * win + 128) // 128) * 128, bb)
    if (
        h % 8 == 0 and w % 128 == 0
        and side_y <= h and side_x <= w
        and occ_cfg.max_ray_px % 8 == 0
    ):
        return side_y, side_x
    return None


def _use_fused(occ: jnp.ndarray, occ_cfg: OccupancyConfig) -> bool:
    if occ_cfg.backend == "xla":
        return False
    h, w = occ.shape
    eligible = _fused_side(h, w, occ_cfg) > 0
    if occ_cfg.backend == "fused":
        if not eligible:
            raise ValueError(f"fused raster ineligible for grid {occ.shape} / {occ_cfg}")
        return True
    return eligible and jax.default_backend() == "tpu"


def _update_occupancy_fused(
    occ: jnp.ndarray,
    points_xy: jnp.ndarray,
    valid: jnp.ndarray,
    robot_xy: jnp.ndarray,
    map_cfg: MapConfig,
    occ_cfg: OccupancyConfig,
    interpret: bool,
) -> jnp.ndarray:
    """Prep + dispatch for the fused Pallas raster (`ops/pallas/raster_fused`).

    Same semantics as the XLA path below; ALL per-sample work (Bresenham
    coords, body/endpoint masks) happens inside the kernel — the host side
    only computes per-ray endpoint cells and the window slice.  Rays are
    packed to the front (order-preserving, so consecutive rays still sweep
    angular wedges) — dead tail blocks then cost one scalar compare each.

    A live ray's endpoint and the robot cell both lie inside the update
    window, so every Bresenham cell (their hull) does too — the XLA path's
    per-sample ``cell_in_win`` test is vacuous here and is omitted.
    """
    from icp_slam_yolo_tpu.ops.pallas.raster_fused import raster_update_pallas
    from icp_slam_yolo_tpu.ops.voxel import compact

    h, w = occ.shape
    win = occ_cfg.window_px

    rx, ry = world_to_px(robot_xy[None, :], map_cfg)
    rx, ry = rx[0], ry[0]
    ex0, ey0 = world_to_px(points_xy, map_cfg)
    x1 = jnp.maximum(0, rx - win)
    y1 = jnp.maximum(0, ry - win)
    x2 = jnp.minimum(w, rx + win)
    y2 = jnp.minimum(h, ry + win)
    in_window = (ex0 >= x1) & (ex0 < x2) & (ey0 >= y1) & (ey0 < y2)
    ray_valid = valid & in_window

    # pack live rays to the front (stable: angular order preserved)
    packed_xy, ray_valid = compact(points_xy, ray_valid, points_xy.shape[0])
    ex, ey = world_to_px(packed_xy, map_cfg)

    dims = _fused_grid_dims(h, w, occ_cfg)
    if dims is not None:
        # full-grid kernel: the window is DMA'd in/out at (y1s, x1s) INSIDE
        # the kernel.  The XLA window extract/write-back (`dynamic_slice` +
        # `dynamic_update_slice`) serializes into per-robot while loops under
        # vmap and cost more fleet-step device time than the raster itself.
        # DMA offsets must be tile-aligned, so the origin floors to the
        # (8, 128) grid and the window carries the alignment slack.
        side_y, side_x = dims
        bb = 128 if win <= 112 else 256
        y1s = (jnp.clip(ry - win, 0, h - side_y) // 8) * 8
        x1s = (jnp.clip(rx - win, 0, w - side_x) // 128) * 128
    else:
        side_y = side_x = _fused_side(h, w, occ_cfg)
        bb = 128 if win <= 112 else min(256, side_x)
        y1s = jnp.clip(ry - win, 0, h - side_y)
        x1s = jnp.clip(rx - win, 0, w - side_x)

    eyl = ey - y1s
    exl = ex - x1s

    n = points_xy.shape[0]
    n_pad = -(-n // 32) * 32
    if n_pad != n:
        eyl = jnp.pad(eyl, (0, n_pad - n), constant_values=0)
        exl = jnp.pad(exl, (0, n_pad - n), constant_values=0)
        ray_valid = jnp.pad(ray_valid, (0, n_pad - n))

    if dims is not None:
        from icp_slam_yolo_tpu.ops.pallas.raster_fused import grid_update_call

        call = grid_update_call(
            side_y, side_x, occ_cfg.max_ray_px, bb,
            float(occ_cfg.p_occ_inc), float(occ_cfg.p_free_decay),
            float(occ_cfg.block_threshold), interpret,
        )
        return call(occ, eyl, exl, ray_valid, ry - y1s, rx - x1s, y1s, x1s)

    win_p = jax.lax.dynamic_slice(occ, (y1s, x1s), (side_y, side_x))
    new_win = raster_update_pallas(
        win_p, eyl, exl, ray_valid, ry - y1s, rx - x1s,
        k=occ_cfg.max_ray_px, bb=bb,
        p_occ_inc=occ_cfg.p_occ_inc, p_free_decay=occ_cfg.p_free_decay,
        block_threshold=occ_cfg.block_threshold, interpret=interpret,
    )
    return jax.lax.dynamic_update_slice(occ, new_win, (y1s, x1s))


def update_occupancy(
    occ: jnp.ndarray,
    points_xy: jnp.ndarray,
    valid: jnp.ndarray,
    robot_xy: jnp.ndarray,
    map_cfg: MapConfig,
    occ_cfg: OccupancyConfig,
) -> jnp.ndarray:
    """One scan's occupancy update (`process.py:114-179` semantics, see module doc).

    Args:
      occ: ``(H, W)`` float32 probability grid (init 0.5).
      points_xy: ``(N, 2)`` global-frame endpoints (mm).
      valid: ``(N,)`` bool endpoint mask.
      robot_xy: ``(2,)`` robot position (mm).

    Returns the updated grid (same shape).
    """
    if _use_fused(occ, occ_cfg):
        return _update_occupancy_fused(
            occ, points_xy, valid, robot_xy, map_cfg, occ_cfg,
            interpret=jax.default_backend() != "tpu",
        )
    h, w = occ.shape
    win = occ_cfg.window_px

    if occ_cfg.skip_dead_rays:
        # ray order is irrelevant under the frozen-probability formulation
        # (per-cell counts commute), so pack valid rays to the front and let
        # entirely-dead 128-ray blocks skip their one-hot matmuls below
        from icp_slam_yolo_tpu.ops.voxel import compact

        points_xy, valid = compact(points_xy, valid, points_xy.shape[0])

    rx, ry = world_to_px(robot_xy[None, :], map_cfg)
    rx, ry = rx[0], ry[0]
    ex, ey = world_to_px(points_xy, map_cfg)

    # window clamp around the robot (`process.py:133-141`)
    x1 = jnp.maximum(0, rx - win)
    y1 = jnp.maximum(0, ry - win)
    x2 = jnp.minimum(w, rx + win)
    y2 = jnp.minimum(h, ry + win)
    in_window = (ex >= x1) & (ex < x2) & (ey >= y1) & (ey < y2)
    ray_valid = valid & in_window

    cells = bresenham_cells(rx, ry, ex, ey, ray_valid, occ_cfg.max_ray_px)
    # samples that fall outside the window are skipped (reference `continue`,
    # `process.py:150-151`) but do not terminate the ray
    cell_in_win = (cells.px >= x1) & (cells.px < x2) & (cells.py >= y1) & (cells.py < y2)
    body = cells.body & cell_in_win
    endpoint = cells.endpoint & cell_in_win

    # Everything below runs on a FIXED-SIZE window slice around the robot:
    # the reference's (possibly edge-shrunk) update window always fits inside
    # a clamped-origin window of side `ww`, so semantics are unchanged while
    # the update touches ~80k cells instead of the whole grid.
    ww = min(2 * win, w)
    wh = min(2 * win, h)
    x1s = jnp.clip(rx - win, 0, w - ww)
    y1s = jnp.clip(ry - win, 0, h - wh)
    pxc = jnp.clip(cells.px, 0, w - 1)
    pyc = jnp.clip(cells.py, 0, h - 1)
    lx = jnp.clip(pxc - x1s, 0, ww - 1)
    ly = jnp.clip(pyc - y1s, 0, wh - 1)
    win_p = jax.lax.dynamic_slice(occ, (y1s, x1s), (wh, ww))

    # MXU formulation of gather + scatter-add (random-access gathers/scatters
    # are serial on TPU and dominated the whole SLAM step; profiling showed
    # the per-sample grid gather at 1.18 ms/scan and each scatter-add at
    # 0.6 ms).  With row/column one-hots  A[s, y] = [ly_s == y]  and
    # B[s, x] = [lx_s == x]:
    #   * gather of a BINARY grid:  G[ly_s, lx_s] = sum_yx A[s,y] G[y,x] B[s,x]
    #     (einsum; exact in bf16 because every product is 0 or 1),
    #   * scatter-add of a 0/1 mask m:  count[y, x] = sum_s m_s A[s,y] B[s,x]
    #     = (A*m)^T @ B  (integer counts, exact in f32 accumulation).
    # Both map onto dense MXU matmuls; the early-stop test only ever needs the
    # binary `p >= block_threshold` grid, never the probabilities themselves,
    # which is what makes the bf16 lookup exact.
    k = occ_cfg.max_ray_px
    blocked_grid = (win_p >= occ_cfg.block_threshold).astype(jnp.bfloat16)
    i = jnp.arange(k, dtype=jnp.int32)[None, :]
    ay = jnp.arange(wh, dtype=jnp.int32)[None, :]
    bx = jnp.arange(ww, dtype=jnp.int32)[None, :]

    def block_counts(sl):
        """One ray block's (free_n, occ_n) counts via one-hot matmuls."""
        ly_f = ly[sl].reshape(-1)
        lx_f = lx[sl].reshape(-1)
        a_hot = (ly_f[:, None] == ay).astype(jnp.bfloat16)
        b_hot = (lx_f[:, None] == bx).astype(jnp.bfloat16)
        # frozen-probability early stop at the first blocked body cell
        rows = jnp.dot(a_hot, blocked_grid, preferred_element_type=jnp.float32)  # (S, WW)
        blocked_s = jnp.sum(rows * b_hot.astype(jnp.float32), axis=1)
        body_b = body[sl]
        blocked = body_b & (blocked_s.reshape(body_b.shape) > 0.5)
        first_block = jnp.min(jnp.where(blocked, i, k), axis=1, keepdims=True)
        body2 = body_b & (i < first_block)
        end2 = endpoint[sl] & (first_block == k)
        bodyf = body2.reshape(-1, 1).astype(jnp.bfloat16)
        endf = end2.reshape(-1, 1).astype(jnp.bfloat16)
        free_b = jnp.dot((a_hot * bodyf).T, b_hot, preferred_element_type=jnp.float32)
        occ_b = jnp.dot((a_hot * endf).T, b_hot, preferred_element_type=jnp.float32)
        return free_b, occ_b

    n = points_xy.shape[0]
    if occ_cfg.skip_dead_rays and n > 128:
        free_n = jnp.zeros((wh, ww), jnp.float32)
        occ_n = jnp.zeros((wh, ww), jnp.float32)
        for start in range(0, n, 128):
            sl = slice(start, min(start + 128, n))
            live = jnp.any(valid[sl])
            fb, ob = jax.lax.cond(
                live,
                lambda sl=sl: block_counts(sl),
                lambda: (jnp.zeros((wh, ww), jnp.float32), jnp.zeros((wh, ww), jnp.float32)),
            )
            free_n = free_n + fb
            occ_n = occ_n + ob
    else:
        free_n, occ_n = block_counts(slice(0, n))

    win_p = win_p * jnp.power(jnp.float32(occ_cfg.p_free_decay), free_n)
    win_p = jnp.minimum(1.0, win_p + occ_cfg.p_occ_inc * occ_n)
    return jax.lax.dynamic_update_slice(occ, win_p, (y1s, x1s))


def _binary_grid_lookup(grid: jnp.ndarray, ly: jnp.ndarray, lx: jnp.ndarray) -> jnp.ndarray:
    """Per-point lookup of a BINARY grid as two one-hot MXU passes.

    ``grid[ly_i, lx_i]`` for in-range int32 coords: random gathers are serial
    on TPU, but with 0/1 values the gather is exact in bf16 —
    ``sum_y onehot(ly)[i,y] * grid[y,x] * onehot(lx)[i,x]`` has exactly one
    nonzero term per point.  Returns a float 0/1 vector (compare ``> 0.5``).
    """
    h, w = grid.shape
    g = grid.astype(jnp.bfloat16)
    a_hot = (ly[:, None] == jnp.arange(h, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    b_hot = (lx[:, None] == jnp.arange(w, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    rows = jnp.dot(a_hot, g, preferred_element_type=jnp.bfloat16)  # (N, W), 0/1
    return jnp.sum(rows * b_hot, axis=1)


def occupancy_keep_mask(
    points_xy: jnp.ndarray,
    valid: jnp.ndarray,
    occ: jnp.ndarray,
    map_cfg: MapConfig,
    free_threshold: float,
) -> jnp.ndarray:
    """Keep-mask for `filter_new_points_by_occupancy` / `prune_global_map`
    (`process.py:203-249`): drop points whose cell is confidently free
    (``p < free_threshold``); out-of-bounds points are kept.

    The per-point grid lookup only needs the BINARY ``p >= free_threshold``
    grid, so it runs as a one-hot bilinear on the MXU (random gathers are
    serial on TPU and this was 0.2 ms x2 per SLAM step).
    """
    h, w = occ.shape
    px, py = world_to_px(points_xy, map_cfg)
    oob = (px < 0) | (px >= w) | (py < 0) | (py >= h)
    kept = _binary_grid_lookup(
        occ >= free_threshold, jnp.clip(py, 0, h - 1), jnp.clip(px, 0, w - 1)
    )
    return valid & (oob | (kept > 0.5))


def prune_keep_mask(
    points_xy: jnp.ndarray,
    valid: jnp.ndarray,
    occ: jnp.ndarray,
    robot_xy: jnp.ndarray,
    map_cfg: MapConfig,
    occ_cfg: OccupancyConfig,
) -> jnp.ndarray:
    """Keep-mask for the map prune (`prune_global_map`, `process.py:228-249`).

    With ``occ_cfg.prune_window_margin_px < 0`` this is the exact full-grid
    lookup (`occupancy_keep_mask`).  With a margin >= 0 the lookup is
    restricted to the raster window around the robot expanded by the margin:
    every map point has been checked on each prior prune, occupancy only
    mutates inside the per-step window, and the margin covers the robot's
    travel between prunes — so cells outside the expanded window cannot have
    newly become free and the previous keep-decision (the point's presence)
    stands.  This cuts the one-hot lookup from grid-width to window-width
    (the single most expensive op of the SLAM step at 24k-point map scale).
    """
    margin = occ_cfg.prune_window_margin_px
    if margin < 0:
        return occupancy_keep_mask(points_xy, valid, occ, map_cfg, occ_cfg.free_threshold)
    h, w = occ.shape
    win = occ_cfg.window_px + margin
    ww = min(2 * win, w)
    wh = min(2 * win, h)
    rx, ry = world_to_px(robot_xy[None, :], map_cfg)
    rx, ry = rx[0], ry[0]
    x1s = jnp.clip(rx - win, 0, w - ww)
    y1s = jnp.clip(ry - win, 0, h - wh)
    px, py = world_to_px(points_xy, map_cfg)
    inside = (px >= x1s) & (px < x1s + ww) & (py >= y1s) & (py < y1s + wh)
    # grid-OOB points are kept by the full check too (their cell is outside
    # `inside` whenever the window is interior; at map edges clip keeps parity
    # because OOB cells clamp onto border cells only when inside is False)
    lx = jnp.clip(px - x1s, 0, ww - 1)
    ly = jnp.clip(py - y1s, 0, wh - 1)
    win_p = jax.lax.dynamic_slice(occ, (y1s, x1s), (wh, ww))
    kept = _binary_grid_lookup(win_p >= occ_cfg.free_threshold, ly, lx)
    return valid & (~inside | (kept > 0.5))
