"""Fully-fused ICP: the entire registration loop as ONE Pallas kernel.

Everything `core/registration.icp_masked` does per iteration — rigid transform,
masked NN correspondence, threshold gating, centred 2-D Kabsch moments,
closed-form pose update, convergence freeze — runs inside a single kernel with
the source scan and target map resident in VMEM for all iterations.  Zero HBM
traffic between iterations; no XLA per-op dispatch overhead (the jitted XLA
path issues ~30 small ops per iteration, which dominates at these sizes).

Correspondence coordinates are extracted with a one-hot select-and-reduce per
target tile (no dynamic gather, which Mosaic lowers poorly); moments are
centred before reduction (numerical parity with `ops/kabsch.best_fit_se2`) and
accumulated in metres.

Output layout (1, 8) f32: ``[tx, ty, cos, sin, rmse_mm, n_inliers, n_iters, 0]``
(rmse is 1e30 when no inliers survive — the wrapper maps it to +inf; the
rotation travels as (cos, sin) because Mosaic has no atan2 lowering).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _nn_pass(px, py, tgt_t_ref, valid_t_ref, col, tile_t, n_tiles, t):
    """One full NN sweep: returns (min d2 (S,1), matched x (S,1), matched y (S,1))."""
    s = px.shape[0]

    def tbody(k, carry):
        tv = valid_t_ref[0:1, pl.ds(k * tile_t, tile_t)]

        def live(carry):
            run_min, mx, my = carry
            tx = tgt_t_ref[0:1, pl.ds(k * tile_t, tile_t)]
            ty = tgt_t_ref[1:2, pl.ds(k * tile_t, tile_t)]
            dx = px - tx
            dy = py - ty
            d2 = dx * dx + dy * dy
            d2 = jnp.where(tv > 0, d2, _BIG)
            tmin = jnp.min(d2, axis=1, keepdims=True)
            arg = jnp.min(jnp.where(d2 <= tmin, col, t), axis=1, keepdims=True)
            sel = col == arg  # exactly one column per row (first minimum)
            tmx = jnp.sum(jnp.where(sel, tx, 0.0), axis=1, keepdims=True)
            tmy = jnp.sum(jnp.where(sel, ty, 0.0), axis=1, keepdims=True)
            better = tmin < run_min
            return (
                jnp.where(better, tmin, run_min),
                jnp.where(better, tmx, mx),
                jnp.where(better, tmy, my),
            )

        # `compact` packs valid map points to the front of the buffer, so the
        # tail tiles are usually entirely invalid — one cheap (1, T) reduce
        # skips the whole (S, T) sweep for them (no-op either way: invalid
        # distances are BIG and never win the running min)
        return jax.lax.cond(jnp.max(tv) > 0, live, lambda c: c, carry)

    init = (
        jnp.full((s, 1), jnp.float32(_BIG)),
        jnp.zeros((s, 1), jnp.float32),
        jnp.zeros((s, 1), jnp.float32),
    )
    return jax.lax.fori_loop(0, n_tiles, tbody, init)


def _icp_kernel(
    src_ref, src_valid_ref, tgt_t_ref, valid_t_ref, params_ref, out_ref,
    *, tile_t: int, iters: int, thr2: float, tol: float, early_exit: bool,
):
    s = src_ref.shape[0]
    t = tgt_t_ref.shape[1]
    n_tiles = t // tile_t
    col = jax.lax.broadcasted_iota(jnp.int32, (s, tile_t), 1)

    sx = src_ref[:, 0:1]
    sy = src_ref[:, 1:2]
    sv = src_valid_ref[:, 0:1]

    def apply_pose(cth, sth, px_, py_):
        return cth * sx - sth * sy + px_, sth * sx + cth * sy + py_

    # Mosaic has no atan2 lowering, so the rotation is carried as (cos, sin):
    # the Kabsch solve only ever needs cos/sin of the update angle, which are
    # exactly sxx/r and sxy/r with r = hypot(sxx, sxy).  The caller converts
    # back to an angle with one atan2 outside the kernel.
    ones_row = jnp.ones((1, s), jnp.float32)

    def iter_body(_, carry):
        cth, sth, ptx, pty, prev_err, done, iters_done = carry
        px, py = apply_pose(cth, sth, ptx, pty)
        d2, mx, my = _nn_pass(px, py, tgt_t_ref, valid_t_ref, col, tile_t, n_tiles, t)
        w = sv * (d2 < thr2).astype(jnp.float32)  # (S,1)

        # all eight moment sums in ONE MXU reduction — a dozen separate
        # scalar reductions per iteration dominated the kernel otherwise.
        # Uncentred moments in metres + centring correction (numerically fine
        # at arena scale; see module doc).
        px_m, py_m, mx_m, my_m = px * 1e-3, py * 1e-3, mx * 1e-3, my * 1e-3
        cols = jnp.concatenate(
            [
                w,
                w * px_m, w * py_m, w * mx_m, w * my_m,
                w * (px_m * mx_m + py_m * my_m),
                w * (px_m * my_m - py_m * mx_m),
                w * jnp.sqrt(d2),
            ],
            axis=1,
        )  # (S, 8)
        # HIGHEST precision: the MXU's default bf16 pass corrupts the moment
        # sums by ~0.4% and the trajectory diverges from the oracle
        m = jnp.dot(
            ones_row, cols,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )[0]  # (8,)
        sw = m[0]
        safe = jnp.maximum(sw, 1e-9)
        cax = m[1] / safe   # metres
        cay = m[2] / safe
        cbx = m[3] / safe
        cby = m[4] / safe
        sxx = m[5] - (m[1] * m[3] + m[2] * m[4]) / safe
        sxy = m[6] - (m[1] * m[4] - m[2] * m[3]) / safe
        degenerate = jnp.logical_or(sw < 1e-6, sxx * sxx + sxy * sxy < 1e-30)
        r = jnp.sqrt(sxx * sxx + sxy * sxy)
        safe_r = jnp.maximum(r, 1e-30)
        c2 = jnp.where(degenerate, 1.0, sxx / safe_r)
        s2 = jnp.where(degenerate, 0.0, sxy / safe_r)
        # centroids are in metres; the translation delta goes back to mm
        dtx = jnp.where(degenerate, 0.0, (cbx - (c2 * cax - s2 * cay)) * 1e3)
        dty = jnp.where(degenerate, 0.0, (cby - (s2 * cax + c2 * cay)) * 1e3)
        # compose delta o pose (rotation composition on (cos, sin), renormalised)
        nc = c2 * cth - s2 * sth
        ns = s2 * cth + c2 * sth
        rn = jax.lax.rsqrt(nc * nc + ns * ns)
        nc = nc * rn
        ns = ns * rn
        ntx = c2 * ptx - s2 * pty + dtx
        nty = s2 * ptx + c2 * pty + dty

        err = m[7] / jnp.maximum(sw, 1.0)  # mean inlier distance (mm)
        converged = jnp.abs(prev_err - err) < tol
        new_done = jnp.logical_or(done, converged)
        cth = jnp.where(done, cth, nc)
        sth = jnp.where(done, sth, ns)
        ptx = jnp.where(done, ptx, ntx)
        pty = jnp.where(done, pty, nty)
        iters_done = iters_done + jnp.where(done, 0.0, 1.0)
        return cth, sth, ptx, pty, err, new_done, iters_done

    # params layout: [x_mm, y_mm, cos(theta), sin(theta)]
    init = (
        params_ref[0, 2],
        params_ref[0, 3],
        params_ref[0, 0],
        params_ref[0, 1],
        jnp.float32(_BIG),
        jnp.bool_(False),
        jnp.float32(0.0),
    )

    if early_exit:
        # a real while_loop skips remaining iterations after convergence
        # (typical: ~25 of 50).  Wins for single-lane use (the sequence
        # pipeline); LOSES under vmap, where the batched cond syncs every
        # iteration and runs to the slowest lane — batched callers use fori.
        def cond(state):
            i, carry = state
            return jnp.logical_and(i < iters, jnp.logical_not(carry[5]))

        def body(state):
            i, carry = state
            return i + 1, iter_body(i, carry)

        _, (cth, sth, ptx, pty, _, _, n_iters) = jax.lax.while_loop(
            cond, body, (jnp.int32(0), init)
        )
    else:
        cth, sth, ptx, pty, _, _, n_iters = jax.lax.fori_loop(0, iters, iter_body, init)

    # final inlier RMSE at the converged pose (Open3D definition)
    px, py = apply_pose(cth, sth, ptx, pty)
    d2, _, _ = _nn_pass(px, py, tgt_t_ref, valid_t_ref, col, tile_t, n_tiles, t)
    w = sv * (d2 < thr2).astype(jnp.float32)
    n_in = jnp.sum(w)
    rmse = jnp.where(
        n_in > 0,
        jnp.sqrt(jnp.sum(w * d2) / jnp.maximum(n_in, 1.0)),
        jnp.float32(_BIG),
    )

    out_ref[0, 0] = ptx
    out_ref[0, 1] = pty
    out_ref[0, 2] = cth
    out_ref[0, 3] = sth
    out_ref[0, 4] = rmse
    out_ref[0, 5] = n_in
    out_ref[0, 6] = n_iters
    out_ref[0, 7] = jnp.float32(0.0)


def icp_fused_pallas(
    src_xy, src_valid, tgt_xy, tgt_valid, init_pose,
    iters: int = 50, threshold_mm: float = 200.0, tolerance: float = 1e-5,
    early_exit: bool = True, interpret: bool = False,
):
    """Run the whole gated point-to-point ICP in one kernel.

    Returns ``(pose (3,), rmse, n_inliers, n_iters)``; degenerate-input
    handling (min_points) is the caller's job (`core/registration`).
    """
    s, t = src_xy.shape[0], tgt_xy.shape[0]
    assert s % 8 == 0 and t % 128 == 0, (s, t)
    tile_t = min(t, 2048)

    kernel = functools.partial(
        _icp_kernel, tile_t=tile_t, iters=iters,
        thr2=float(threshold_mm) ** 2, tol=float(tolerance), early_exit=early_exit,
    )
    init_pose = init_pose.astype(jnp.float32)
    params = jnp.stack(
        [init_pose[0], init_pose[1], jnp.cos(init_pose[2]), jnp.sin(init_pose[2])]
    ).reshape(1, 4)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 8), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        # scalar results live in SMEM (Mosaic can't store scalars to VMEM)
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(
        src_xy.astype(jnp.float32),
        src_valid.astype(jnp.float32).reshape(s, 1),
        tgt_xy.astype(jnp.float32).T,
        tgt_valid.astype(jnp.float32).reshape(1, t),
        params,
    )
    theta = jnp.arctan2(out[0, 3], out[0, 2])
    pose = jnp.stack([out[0, 0], out[0, 1], theta])
    rmse = jnp.where(out[0, 4] >= jnp.float32(_BIG), jnp.float32(jnp.inf), out[0, 4])
    return pose, rmse, out[0, 5].astype(jnp.int32), out[0, 6].astype(jnp.int32)
