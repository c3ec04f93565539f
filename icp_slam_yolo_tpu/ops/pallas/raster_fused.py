"""Fused occupancy-raster kernel: the whole per-scan grid update in one
Pallas program.

The XLA formulation (`ops/raster.update_occupancy`) is HBM-bound: the one-hot
matrices it feeds the MXU — ``a_hot``/``b_hot`` ``(N*K, W)`` and the ``rows``
product — are tens of MB of intermediates per scan that each round-trip
through HBM.  Here they never exist outside VMEM: each 32-ray block builds its
one-hots on the fly, runs the gather/scatter matmuls, and accumulates the
free/occupied counts in registers.

The kernel's inputs are PER-RAY, not per-sample: the closed-form Bresenham
sample generation (`ops/raster.bresenham_cells` semantics, itself the exact
cell sequence of reference `process.py:86-112`) runs *inside* the kernel from
each ray's endpoint cell.  Profiling showed the XLA-side ``(N, K)`` sample
materialisation (coords, body/endpoint masks, and four bbox reductions over
``N*K``) costing more device time than the raster kernel itself — ~140 us per
sequential SLAM step and ~550 us per 8-robot fleet step — all of which
collapses into a few ``(32, K)`` register-resident integer ops per block here.
Wedge bounding boxes likewise derive from the 32 endpoint cells + the robot
cell (every Bresenham cell lies in the endpoint/robot hull), an O(N) XLA
reduction instead of O(N*K).

TPU-specific notes (verified on v5e, see docs/PERF.md):

  * **3-D one-hot build + sublane merge.**  Ray-major ``(32, K)`` coords can't
    be cheaply flattened to sample-major ``(32*K, 1)`` (lane->sublane
    relayout), but the one-hot compare can run in 3-D — ``(32, K, 1) ==
    iota(32, K, BB)`` — and the ``(32, K, BB) -> (32*K, BB)`` reshape merges
    outer+sublane dims, which IS layout-compatible (K must be a multiple
    of 8).  Masks multiply in 3-D before the merge for the same reason.
  * **Wedge bounding boxes + `pltpu.roll`.**  Scan rays arrive in angular
    order, so a block of 32 consecutive rays sweeps a wedge whose bounding
    box is ~``window_px`` wide — much smaller than the full update window.
    One-hots are built at the block-local ``BB``x``BB`` resolution (128 or
    256: exact MXU tiles, no padding waste) and the block's count
    contribution is placed into the full window with two dynamic rolls
    (Mosaic rejects dynamic lane slicing/writes; `roll` is the supported
    dynamic data-movement primitive).  Rare blocks whose wedge overflows
    ``BB`` take a full-window slow path behind a per-block scalar branch;
    dead blocks (no valid ray) cost one scalar compare.
  * **Exact integer division on the VPU.**  The Bresenham minor-axis step
    count needs ``ceil(a / b)`` in int32; TPUs have no integer divide, so the
    kernel computes an f32 quotient estimate and repairs it with one integer
    remainder fixup (operands are bounded by ``2*K*window`` << 2^24, so the
    estimate is within +-1 and a single fixup is exact).

Semantics are identical to the XLA path (`process.py:114-179` frozen-
probability formulation): per cell, ``p *= decay^n_free_crossings`` then
``p = min(1, p + inc * n_endpoints)``, with each ray's samples truncated at
the first already-blocked body cell.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RAY_BLOCK = 32  # rays per block (wedge granularity)


def _floordiv_exact(a, b):
    """Exact ``a // b`` for int32 arrays with ``b >= 1`` and ``|a| << 2^24``:
    f32 quotient estimate + one integer remainder fixup."""
    q = jnp.floor(a.astype(jnp.float32) / b.astype(jnp.float32)).astype(jnp.int32)
    r = a - q * b
    return q + jnp.where(r >= b, 1, 0) - jnp.where(r < 0, 1, 0)


def _one_hot_3d(coords, n_rays, k, width):
    """``(R, K)`` int32 local coords -> ``(R*K, width)`` bf16 one-hot rows."""
    i3 = jax.lax.broadcasted_iota(jnp.int32, (n_rays, k, width), 2)
    return (coords[:, :, None] == i3).astype(jnp.bfloat16).reshape(n_rays * k, width)


def _bresenham_block(blk, rly, rlx, k):
    """Sample coords + masks for one 32-ray block, from endpoint cells only.

    Args:
      blk: ``(32, 8)`` int32 ray rows ``[ey, ex, live, ...]`` (window-local).
      rly/rlx: robot cell (window-local scalars).

    Returns ``(ly, lx, body3, end3)``: ``(32, K)`` int32 coords and
    ``(32, K, 1)`` f32 masks.  Masked samples (``i > L``) may carry
    out-of-wedge coords — their one-hot rows are all-zero, contributing
    nothing downstream.
    """
    ey = blk[:, 0:1]
    ex = blk[:, 1:2]
    live = blk[:, 2:3] > 0
    dy = jnp.abs(ey - rly)
    dx = jnp.abs(ex - rlx)
    sy = jnp.where(ey >= rly, 1, -1)
    sx = jnp.where(ex >= rlx, 1, -1)
    ell = jnp.maximum(dx, dy)

    i = jax.lax.broadcasted_iota(jnp.int32, (_RAY_BLOCK, k), 1)

    def minor_steps(d_minor, d_major):
        dmaj = jnp.maximum(d_major, 1)
        a = 2 * i * d_minor - d_major
        b = 2 * dmaj
        # max(0, ceil(a / b)) = max(0, floor((a + b - 1) / b))
        return jnp.maximum(0, _floordiv_exact(a + b - 1, b))

    x_driven = dx > dy  # reference tie-break: `if dx > dy` (process.py:94)
    ky = minor_steps(dy, dx)  # y-steps when x-driven
    kx = minor_steps(dx, dy)  # x-steps when y-driven
    lx = jnp.where(x_driven, rlx + sx * i, rlx + sx * kx)
    ly = jnp.where(x_driven, rly + sy * ky, rly + sy * i)

    in_ray = (i <= ell) & live
    body3 = (in_ray & (i < ell)).astype(jnp.float32)[:, :, None]
    end3 = (in_ray & (i == ell)).astype(jnp.float32)[:, :, None]
    return ly, lx, body3, end3


def _block_counts(ly, lx, body3, end3, bg, n_rays, k, width_y, width_x):
    """Free/occupied count contribution of one ray block at box resolution.

    Args:
      ly/lx: ``(R, K)`` int32 cell coords, already local to the box.
      body3/end3: ``(R, K, 1)`` f32 sample masks.
      bg: ``(width_y, width_x)`` bf16 blocked-cell grid for the same box.

    Returns ``(free, occ)`` each ``(width_y, width_x)`` f32.
    """
    a2 = _one_hot_3d(ly, n_rays, k, width_y)      # (R*K, WY)
    b2 = _one_hot_3d(lx, n_rays, k, width_x)      # (R*K, WX)
    # gather: s[sample] = blocked[ly, lx]  (0/1 exact in bf16)
    rows = jnp.dot(a2, bg, preferred_element_type=jnp.float32)
    s = jnp.sum(rows * b2.astype(jnp.float32), axis=1, keepdims=True)  # (R*K, 1)
    s3 = s.reshape(n_rays, k, 1)
    i3 = jax.lax.broadcasted_iota(jnp.int32, (n_rays, k, 1), 1)
    blocked3 = (body3 > 0) & (s3 > 0.5)
    key3 = jnp.where(blocked3, i3, jnp.int32(k))
    first3 = jnp.min(key3, axis=1, keepdims=True)              # (R, 1, 1)
    body2 = body3 * (i3 < first3).astype(jnp.float32)
    end2 = end3 * (first3 >= k).astype(jnp.float32)
    # stacked scatter: [free; occ] in one MXU pass (masks fold in 3-D)
    a3 = a2.reshape(n_rays, k, width_y)
    stacked = jnp.concatenate(
        [a3 * body2.astype(jnp.bfloat16), a3 * end2.astype(jnp.bfloat16)], axis=2
    ).reshape(n_rays * k, 2 * width_y)
    counts = jax.lax.dot_general(
        stacked, b2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (2*WY, WX)
    return counts[:width_y], counts[width_y:]


def _apply_scan_update(
    win_p, get_meta, get_ray_block, n_blocks,
    *, k: int, bb: int, p_occ_inc: float, p_free_decay: float,
    block_threshold: float,
):
    """Shared window-update body: one scan's free/occupied counts + probability
    update over a ``(wh, ww)`` f32 window array.

    ``get_meta(row, blk)`` reads a per-block int32 scalar (rows: mode, by, bx,
    rly, rlx); ``get_ray_block(blk)`` reads that block's ``(32, 8)`` ray rows —
    closures so the same body serves the window-input kernel and the
    full-grid DMA kernel.
    """
    wh, ww = win_p.shape
    rly = get_meta(3, 0)
    rlx = get_meta(4, 0)
    bg_full = (win_p >= block_threshold).astype(jnp.bfloat16)

    def block_body(b, carry):
        free_acc, occ_acc = carry
        mode = get_meta(0, b)          # 0 dead, 1 fast (fits BB), 2 overflow
        by = get_meta(1, b)
        bx = get_meta(2, b)

        def dead():
            return free_acc, occ_acc

        def fast():
            blk = get_ray_block(b)
            ly, lx, body3, end3 = _bresenham_block(blk, rly, rlx, k)
            ly = ly - by
            lx = lx - bx
            # block-local blocked grid: roll the box corner to the origin and
            # take a static BB x BB slice (dynamic lane slicing is unsupported;
            # roll is the dynamic data-movement primitive Mosaic does have).
            # Roll the f32 window, not the bf16 grid: bf16 rolls fail Mosaic.
            rolled = pltpu.roll(pltpu.roll(win_p, wh - by, 0), ww - bx, 1)[:bb, :bb]
            bg = (rolled >= block_threshold).astype(jnp.bfloat16)
            free_b, occ_b = _block_counts(ly, lx, body3, end3, bg, _RAY_BLOCK, k, bb, bb)

            # place the BB x BB contribution back at (by, bx) with two rolls;
            # zero-size pads are invalid vectors in Mosaic, so skip each
            # concat when the box already spans that window dimension
            def expand(m):
                if wh > bb:
                    m = jnp.concatenate([m, jnp.zeros((wh - bb, bb), jnp.float32)], axis=0)
                if ww > bb:
                    m = jnp.concatenate([m, jnp.zeros((wh, ww - bb), jnp.float32)], axis=1)
                return pltpu.roll(pltpu.roll(m, by, 0), bx, 1)

            return free_acc + expand(free_b), occ_acc + expand(occ_b)

        def slow():
            blk = get_ray_block(b)
            ly, lx, body3, end3 = _bresenham_block(blk, rly, rlx, k)
            # full-window resolution (ww == wh for kernel-eligible windows)
            free_b, occ_b = _block_counts(ly, lx, body3, end3, bg_full, _RAY_BLOCK, k, wh, ww)
            return free_acc + free_b, occ_acc + occ_b

        return jax.lax.cond(
            mode == 0, dead, lambda: jax.lax.cond(mode == 1, fast, slow)
        )

    free_n, occ_n = jax.lax.fori_loop(
        0, n_blocks, block_body,
        (jnp.zeros((wh, ww), jnp.float32), jnp.zeros((wh, ww), jnp.float32)),
    )
    new_p = win_p * jnp.power(jnp.float32(p_free_decay), free_n)
    return jnp.minimum(1.0, new_p + jnp.float32(p_occ_inc) * occ_n)


def _raster_kernel(
    meta_ref, rays_ref, win_ref, out_ref,
    *, k: int, bb: int, p_occ_inc: float, p_free_decay: float,
    block_threshold: float,
):
    out_ref[...] = _apply_scan_update(
        win_ref[...],
        lambda row, b: meta_ref[row, b],
        lambda b: rays_ref[pl.ds(b * _RAY_BLOCK, _RAY_BLOCK), :],
        rays_ref.shape[0] // _RAY_BLOCK,
        k=k, bb=bb, p_occ_inc=p_occ_inc, p_free_decay=p_free_decay,
        block_threshold=block_threshold,
    )


def _raster_grid_kernel(
    meta_ref, rays_ref, grid_ref, out_ref, win_scratch, sem_in, sem_out,
    *, side_y: int, side_x: int, k: int, bb: int, p_occ_inc: float,
    p_free_decay: float, block_threshold: float,
):
    """Full-grid variant: one grid step per robot; the update window is DMA'd
    in/out of the (aliased) HBM grid at a dynamic per-robot origin.  This
    keeps the window extract/write-back INSIDE the kernel — the XLA
    formulation (`dynamic_slice` + `dynamic_update_slice` around the window
    kernel) serializes into per-robot while loops under `vmap` and cost more
    device time than the raster itself in the fleet step.

    DMA offsets must be tile-aligned (sublane 8, lane 128).  The caller sends
    pre-aligned origins; the ``(v // t) * t`` here is a runtime no-op whose
    shape Mosaic's divisibility analysis can prove, which a bare SMEM scalar
    is not."""
    b = pl.program_id(0)
    y0 = (meta_ref[b, 5, 0] // 8) * 8
    x0 = (meta_ref[b, 6, 0] // 128) * 128
    cp_in = pltpu.make_async_copy(
        grid_ref.at[b, pl.ds(y0, side_y), pl.ds(x0, side_x)], win_scratch, sem_in
    )
    cp_in.start()
    cp_in.wait()
    win_scratch[...] = _apply_scan_update(
        win_scratch[...],
        lambda row, blk: meta_ref[b, row, blk],
        lambda blk: rays_ref[0, pl.ds(blk * _RAY_BLOCK, _RAY_BLOCK), :],
        rays_ref.shape[1] // _RAY_BLOCK,
        k=k, bb=bb, p_occ_inc=p_occ_inc, p_free_decay=p_free_decay,
        block_threshold=block_threshold,
    )
    cp_out = pltpu.make_async_copy(
        win_scratch, out_ref.at[b, pl.ds(y0, side_y), pl.ds(x0, side_x)], sem_out
    )
    cp_out.start()
    cp_out.wait()


def raster_update_pallas(
    win_p: jnp.ndarray,
    ey: jnp.ndarray,
    ex: jnp.ndarray,
    ray_live: jnp.ndarray,
    rly: jnp.ndarray,
    rlx: jnp.ndarray,
    *,
    k: int,
    bb: int,
    p_occ_inc: float,
    p_free_decay: float,
    block_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply one scan's occupancy update to a window slice.

    Args:
      win_p: ``(wh, ww)`` f32 probability window (both multiples of 128 and
        square for the kernel's slow path).
      ey/ex: ``(N,)`` int32 window-local endpoint cells per ray; live rays
        MUST already lie inside the window (the caller's in-window test).
      ray_live: ``(N,)`` bool valid-ray mask.
      rly/rlx: window-local robot cell (scalars).
      k: static Bresenham sample budget per ray (multiple of 8, > window_px).
      bb: wedge box size (128 or 256), a multiple of 128 with bb <= ww.

    Returns the updated ``(wh, ww)`` window.
    """
    n = ey.shape[0]
    wh, ww = win_p.shape
    assert n % _RAY_BLOCK == 0 and k % 8 == 0, (n, k)
    assert wh % 8 == 0 and ww % 128 == 0 and bb % 128 == 0 and bb <= min(wh, ww)
    n_blocks = n // _RAY_BLOCK

    # per-block wedge stats (XLA, O(N)): every Bresenham cell lies inside the
    # hull of the robot cell and the block's endpoint cells, so the bbox comes
    # from endpoints alone; dead rays substitute the robot cell.
    eyc = jnp.where(ray_live, ey, rly).reshape(n_blocks, _RAY_BLOCK)
    exc = jnp.where(ray_live, ex, rlx).reshape(n_blocks, _RAY_BLOCK)
    y_min = jnp.minimum(jnp.min(eyc, axis=1), rly)
    y_max = jnp.maximum(jnp.max(eyc, axis=1), rly)
    x_min = jnp.minimum(jnp.min(exc, axis=1), rlx)
    x_max = jnp.maximum(jnp.max(exc, axis=1), rlx)
    fits = (y_max - y_min < bb) & (x_max - x_min < bb)
    by = jnp.clip(y_min, 0, wh - bb)
    bx = jnp.clip(x_min, 0, ww - bb)
    live3 = ray_live.reshape(n_blocks, _RAY_BLOCK)
    mode = jnp.where(jnp.any(live3, axis=1), jnp.where(fits, 1, 2), 0)
    meta = jnp.stack(
        [
            mode,
            by,
            bx,
            jnp.broadcast_to(rly, mode.shape),
            jnp.broadcast_to(rlx, mode.shape),
        ]
    ).astype(jnp.int32)  # (5, NB)

    rays = jnp.concatenate(
        [
            ey[:, None],
            ex[:, None],
            ray_live[:, None].astype(jnp.int32),
            jnp.zeros((n, 5), jnp.int32),
        ],
        axis=1,
    ).astype(jnp.int32)  # (N, 8)

    kernel = functools.partial(
        _raster_kernel, k=k, bb=bb, p_occ_inc=float(p_occ_inc),
        p_free_decay=float(p_free_decay), block_threshold=float(block_threshold),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((wh, ww), jnp.float32),
        # the (R*K, 2*BB) stacked one-hots at BB=256/K=144 need ~22 MB of
        # scoped VMEM — above the 16 MB default, well under the chip's 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        meta,
        rays,
        win_p.astype(jnp.float32),
    )


@functools.lru_cache(maxsize=None)
def grid_update_call(
    side_y: int, side_x: int, k: int, bb: int, p_occ_inc: float,
    p_free_decay: float, block_threshold: float, interpret: bool,
):
    """`custom_vmap`-wrapped single-robot full-grid update for one static
    config: ``call(occ (H, W), ey, ex, live, rly, rlx, y0, x0)``.  `vmap`
    substitutes the batched grid kernel (one instance, one grid step per
    robot) instead of auto-batching — scratch DMA kernels don't auto-batch,
    and the whole point is keeping the per-robot dynamic window off XLA."""
    static = dict(
        side_y=side_y, side_x=side_x, k=k, bb=bb, p_occ_inc=p_occ_inc,
        p_free_decay=p_free_decay, block_threshold=block_threshold,
        interpret=interpret,
    )

    @jax.custom_batching.custom_vmap
    def call(occ, ey, ex, live, rly, rlx, y0, x0):
        return raster_update_grid_pallas(
            occ[None], ey[None], ex[None], live[None],
            rly[None], rlx[None], y0[None], x0[None], **static,
        )[0]

    @call.def_vmap
    def _rule(axis_size, in_batched, *args):
        bargs = [
            a if batched else jnp.broadcast_to(a[None], (axis_size,) + jnp.shape(a))
            for batched, a in zip(in_batched, args)
        ]
        return raster_update_grid_pallas(*bargs, **static), True

    return call


def raster_update_grid_pallas(
    occ: jnp.ndarray,
    ey: jnp.ndarray,
    ex: jnp.ndarray,
    ray_live: jnp.ndarray,
    rly: jnp.ndarray,
    rlx: jnp.ndarray,
    y0: jnp.ndarray,
    x0: jnp.ndarray,
    *,
    side_y: int,
    side_x: int,
    k: int,
    bb: int,
    p_occ_inc: float,
    p_free_decay: float,
    block_threshold: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched full-grid occupancy update: one grid step per robot, window
    extract/write-back by in-kernel DMA at a dynamic origin.

    Args:
      occ: ``(B, H, W)`` f32 probability grids (aliased through to the output;
        cells outside each robot's window are untouched).  ``H`` must be a
        multiple of 8 and ``W`` of 128 (DMA tile alignment — the caller falls
        back to the XLA-windowed path otherwise).
      ey/ex: ``(B, N)`` int32 *window-local* endpoint cells.
      ray_live: ``(B, N)`` bool.
      rly/rlx: ``(B,)`` int32 window-local robot cell.
      y0/x0: ``(B,)`` int32 window origin within the grid, pre-clipped to
        ``[0, H - side_y] x [0, W - side_x]`` and pre-aligned (y0 % 8 == 0,
        x0 % 128 == 0).
      side_y/side_x: static window dims (sublane multiple of 8, lane multiple
        of 128).

    Returns the updated ``(B, H, W)`` grids.
    """
    b_sz, n = ey.shape
    assert n % _RAY_BLOCK == 0 and k % 8 == 0, (n, k)
    assert side_y % 8 == 0 and side_x % 128 == 0 and bb % 128 == 0
    assert bb <= min(side_y, side_x)
    assert occ.shape[1] % 8 == 0 and occ.shape[2] % 128 == 0, occ.shape
    nb = n // _RAY_BLOCK

    eyc = jnp.where(ray_live, ey, rly[:, None]).reshape(b_sz, nb, _RAY_BLOCK)
    exc = jnp.where(ray_live, ex, rlx[:, None]).reshape(b_sz, nb, _RAY_BLOCK)
    y_min = jnp.minimum(jnp.min(eyc, axis=2), rly[:, None])
    y_max = jnp.maximum(jnp.max(eyc, axis=2), rly[:, None])
    x_min = jnp.minimum(jnp.min(exc, axis=2), rlx[:, None])
    x_max = jnp.maximum(jnp.max(exc, axis=2), rlx[:, None])
    fits = (y_max - y_min < bb) & (x_max - x_min < bb)
    by = jnp.clip(y_min, 0, side_y - bb)
    bx = jnp.clip(x_min, 0, side_x - bb)
    live3 = ray_live.reshape(b_sz, nb, _RAY_BLOCK)
    mode = jnp.where(jnp.any(live3, axis=2), jnp.where(fits, 1, 2), 0)
    rows = [mode, by, bx] + [
        jnp.broadcast_to(v[:, None], mode.shape) for v in (rly, rlx, y0, x0)
    ]
    meta = jnp.stack(rows, axis=1).astype(jnp.int32)  # (B, 7, NB)

    rays = jnp.concatenate(
        [
            ey[:, :, None],
            ex[:, :, None],
            ray_live[:, :, None].astype(jnp.int32),
            jnp.zeros((b_sz, n, 5), jnp.int32),
        ],
        axis=2,
    ).astype(jnp.int32)  # (B, N, 8)

    kernel = functools.partial(
        _raster_grid_kernel, side_y=side_y, side_x=side_x, k=k, bb=bb,
        p_occ_inc=float(p_occ_inc), p_free_decay=float(p_free_decay),
        block_threshold=float(block_threshold),
    )
    return pl.pallas_call(
        kernel,
        grid=(b_sz,),
        out_shape=jax.ShapeDtypeStruct(occ.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, 8), lambda b: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((side_y, side_x), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(
        meta,
        rays,
        occ.astype(jnp.float32),
    )
