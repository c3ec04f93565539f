"""Fully-fused ICP: the entire registration loop as ONE Pallas kernel.

Everything `core/registration.icp_masked` does per iteration — rigid transform,
masked NN correspondence, threshold gating, centred 2-D Kabsch moments,
closed-form pose update, convergence freeze — runs inside a single kernel with
the source scan and target map resident in VMEM for all iterations.  Zero HBM
traffic between iterations; no XLA per-op dispatch overhead (the jitted XLA
path issues ~30 small ops per iteration, which dominates at these sizes).

The NN sweep is written in Gram form to minimise VPU work per target element:
the host precomputes ``t8 = [-2*tx; -2*ty; |t|^2 + penalty]`` (penalty = 1e30
on invalid slots, folding the validity mask into the distance itself), so each
tile costs one fused ``G = px*r0 + py*r1 + r2`` evaluation, one min-reduce and
a first-minimum one-hot extraction — ~12 VPU ops/element instead of the ~16 of
the naive ``(px-tx)^2+(py-ty)^2`` formulation (whose mask select and two-term
squared distance the Gram form folds away).  Ties are broken to the first
column within a tile and the first tile across tiles.  Because
the Gram form cancels catastrophically at arena scale (|t|^2 ~ 2e8 mm^2), the
gating/RMSE distance is recomputed exactly from the matched coordinates on the
cheap per-row column.

Dead work is skipped at two granularities, both via host-precomputed SMEM
flags costing one scalar branch each:
  * target tiles with no valid point (`compact` packs valid map points to the
    front, so tail tiles are dead), and
  * SOURCE ROW BLOCKS with no valid scan point — `voxel_downsample` also packs
    its output, so a 512-slot scan buffer holding ~270 live points skips ~40%
    of the sweep.  The Kabsch moments accumulate block-by-block (a dead
    block's weights would be all-zero anyway), which also removes the (S, 1)
    correspondence carries entirely.

Correspondence coordinates are extracted with a select-and-reduce per target
tile (no dynamic gather, which Mosaic lowers poorly); moments are centred
before reduction (numerical parity with `ops/kabsch.best_fit_se2`) and
accumulated in metres.

**Batching.**  ``icp_fused_pallas`` is `jax.custom_batching.custom_vmap`-
wrapped: `vmap` (the fleet path, and the 64-wide headline benchmark) lowers to
ONE kernel instance whose body loops over the robot axis internally, instead
of a vmapped grid dimension.  Measured on v5e, a grid lane costs ~1.7x the
B=1 per-iteration time (11.1 vs 6.6 us/robot-iteration at 2.5k live targets)
— per-grid-step pipeline setup the internal loop does not pay.  All per-robot
state (pose carry, convergence flag, early-exit while_loop, liveness
branches) stays fully independent per robot either way.

Output layout (B, 8) f32: ``[tx, ty, cos, sin, rmse_mm, n_inliers, n_iters, 0]``
per robot (rmse is 1e30 when no inliers survive — the wrapper maps it to
+inf; the rotation travels as (cos, sin) because Mosaic has no atan2
lowering).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
_ROW_BLOCK = 64  # source rows per liveness-skippable block (multiple of 8)


def _nn_pass(px, py, t8_ref, b, live_ref, col, tile_t, n_tiles, skip_dead):
    """One full NN sweep in Gram form over one source row block of robot ``b``.

    Returns ``(exact d2 (R,1), matched x (R,1), matched y (R,1))``.  Ties in
    the f32 Gram value are a real hazard: g is quantised at ~1e-7 * |t|^2, so
    *spatially distant* points at similar range can round to the same g, and
    averaging their coordinates would fabricate a midpoint that is not a map
    point at all — the iota argmin keeps exactly one (first) column.
    """
    r = px.shape[0]
    sentinel = jnp.int32(tile_t)
    zero = jnp.float32(0.0)

    def tbody(k, carry):
        def live(carry):
            min_g, mx_acc, my_acc = carry
            r0 = t8_ref[b, 0:1, pl.ds(k * tile_t, tile_t)]  # -2*tx
            r1 = t8_ref[b, 1:2, pl.ds(k * tile_t, tile_t)]  # -2*ty
            r2 = t8_ref[b, 2:3, pl.ds(k * tile_t, tile_t)]  # |t|^2 (+BIG if invalid)
            g = px * r0 + py * r1 + r2  # d2 - |p|^2, row-constant offset
            tmin = jnp.min(g, axis=1, keepdims=True)
            arg = jnp.min(jnp.where(g <= tmin, col, sentinel), axis=1, keepdims=True)
            one = col == arg  # exactly one column per row (first minimum)
            mx_t = jnp.sum(jnp.where(one, r0, zero), axis=1, keepdims=True)
            my_t = jnp.sum(jnp.where(one, r1, zero), axis=1, keepdims=True)
            better = tmin < min_g
            return (
                jnp.where(better, tmin, min_g),
                jnp.where(better, mx_t, mx_acc),
                jnp.where(better, my_t, my_acc),
            )

        if not skip_dead:
            return live(carry)
        # dead tiles cost one scalar SMEM branch
        return jax.lax.cond(live_ref[b, k] > 0, live, lambda c: c, carry)

    init = (
        jnp.full((r, 1), jnp.float32(_BIG)),
        jnp.zeros((r, 1), jnp.float32),
        jnp.zeros((r, 1), jnp.float32),
    )
    min_g, mx_acc, my_acc = jax.lax.fori_loop(0, n_tiles, tbody, init)
    mx = mx_acc * jnp.float32(-0.5)  # undo the -2 folded into t8 rows 0/1
    my = my_acc * jnp.float32(-0.5)
    # exact distance to the matched point: the Gram value min_g + |p|^2 loses
    # ~6 digits to cancellation at |p| ~ 1e4 mm, the direct form loses none
    dx = px - mx
    dy = py - my
    d2 = jnp.where(min_g < jnp.float32(_BIG), dx * dx + dy * dy, jnp.float32(_BIG))
    return d2, mx, my


def _icp_kernel(
    src_ref, src_valid_ref, t8_ref, live_ref, rb_live_ref, params_ref, out_ref,
    *, tile_t: int, iters: int, thr2: float, tol: float, early_exit: bool,
    skip_dead: bool, anderson: bool,
):
    n_robots, s = src_ref.shape[0], src_ref.shape[1]
    n_tiles = t8_ref.shape[2] // tile_t
    # Liveness skipping stays a real scalar branch per robot — the robot loop
    # is an ordinary fori_loop, so nothing lowers to select.
    if skip_dead:
        blocks = [(blk, i, min(_ROW_BLOCK, s - i)) for blk, i in enumerate(range(0, s, _ROW_BLOCK))]
    else:
        blocks = [(0, 0, s)]
    cols_iota = {
        size: jax.lax.broadcasted_iota(jnp.int32, (size, tile_t), 1)
        for _, _, size in blocks
    }

    # Mosaic has no atan2 lowering, so the rotation is carried as (cos, sin):
    # the Kabsch solve only ever needs cos/sin of the update angle, which are
    # exactly sxx/r and sxy/r with r = hypot(sxx, sxy).  The caller converts
    # back to an angle with one atan2 outside the kernel.

    def robot_body(b, _):
        def block_correspond(start, size, cth, sth, ptx, pty):
            """Transform + NN for one row block; returns (px, py, w, d2, mx, my)."""
            sx = src_ref[b, start : start + size, 0:1]
            sy = src_ref[b, start : start + size, 1:2]
            sv = src_valid_ref[b, start : start + size, 0:1]
            px = cth * sx - sth * sy + ptx
            py = sth * sx + cth * sy + pty
            d2, mx, my = _nn_pass(
                px, py, t8_ref, b, live_ref, cols_iota[size], tile_t, n_tiles, skip_dead
            )
            w = sv * (d2 < thr2).astype(jnp.float32)
            return px, py, w, d2, mx, my

        def iter_body(_, carry):
            if anderson:
                (cth, sth, ptx, pty, prev_err, done, iters_done,
                 pf0, pf1, pf2, pf3, pg0, pg1, pg2, pg3, have_prev) = carry
            else:
                cth, sth, ptx, pty, prev_err, done, iters_done = carry

            # all eight moment sums per block in ONE MXU reduction, accumulated
            # across live blocks (dead blocks would contribute zero weight).
            # Uncentred moments in metres + centring correction (numerically
            # fine at arena scale; see module doc).
            m = jnp.zeros((1, 8), jnp.float32)
            for blk, start, size in blocks:
                def live_block(start=start, size=size):
                    px, py, w, d2, mx, my = block_correspond(start, size, cth, sth, ptx, pty)
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
                    )  # (R, 8)
                    # HIGHEST precision: the MXU's default bf16 pass corrupts
                    # the moment sums and the trajectory diverges from the
                    # oracle
                    return jnp.dot(
                        jnp.ones((1, size), jnp.float32), cols,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )

                if skip_dead:
                    m = m + jax.lax.cond(
                        rb_live_ref[b, blk] > 0, live_block, lambda: jnp.zeros((1, 8), jnp.float32)
                    )
                else:
                    m = m + live_block()
            m = m[0]
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

            if anderson:
                # Anderson(1) extrapolation on the pose fixed point (AA-ICP,
                # arxiv 1709.05479; see core/registration for the math): f_k
                # is this iteration's delta in (mm, mm, L*cos, L*sin) with
                # L = 1000 balancing rotation vs translation; gamma only
                # extrapolates (<= 0) and resets when the residual grew (an
                # NN-reassignment kink).  Pure scalar SREG math — per-robot
                # branches and early-exit semantics are untouched.
                L = jnp.float32(1000.0)
                f0 = ntx - ptx
                f1 = nty - pty
                f2 = L * (nc - cth)
                f3 = L * (ns - sth)
                d0, d1, d2_, d3 = f0 - pf0, f1 - pf1, f2 - pf2, f3 - pf3
                den = d0 * d0 + d1 * d1 + d2_ * d2_ + d3 * d3
                num = f0 * d0 + f1 * d1 + f2 * d2_ + f3 * d3
                gamma = jnp.where(den > 1e-12, num / jnp.maximum(den, 1e-12), 0.0)
                gamma = jnp.clip(gamma, -9.0, 0.0)
                fn = f0 * f0 + f1 * f1 + f2 * f2 + f3 * f3
                pfn = pf0 * pf0 + pf1 * pf1 + pf2 * pf2 + pf3 * pf3
                gamma = jnp.where(jnp.logical_and(have_prev, fn <= pfn), gamma, 0.0)
                ax = ntx - gamma * (ntx - pg0)
                ay = nty - gamma * (nty - pg1)
                ac = nc - gamma * (nc - pg2)
                as_ = ns - gamma * (ns - pg3)
                arn = jax.lax.rsqrt(jnp.maximum(ac * ac + as_ * as_, 1e-12))
                ac = ac * arn
                as_ = as_ * arn
                # history: f_k and the PLAIN iterate g_k (not the accelerated one)
                pf0 = jnp.where(done, pf0, f0)
                pf1 = jnp.where(done, pf1, f1)
                pf2 = jnp.where(done, pf2, f2)
                pf3 = jnp.where(done, pf3, f3)
                pg0 = jnp.where(done, pg0, ntx)
                pg1 = jnp.where(done, pg1, nty)
                pg2 = jnp.where(done, pg2, nc)
                pg3 = jnp.where(done, pg3, ns)
                have_prev = jnp.logical_or(have_prev, jnp.logical_not(done))
                ntx, nty, nc, ns = ax, ay, ac, as_

            cth = jnp.where(done, cth, nc)
            sth = jnp.where(done, sth, ns)
            ptx = jnp.where(done, ptx, ntx)
            pty = jnp.where(done, pty, nty)
            iters_done = iters_done + jnp.where(done, 0.0, 1.0)
            if anderson:
                return (cth, sth, ptx, pty, err, new_done, iters_done,
                        pf0, pf1, pf2, pf3, pg0, pg1, pg2, pg3, have_prev)
            return cth, sth, ptx, pty, err, new_done, iters_done

        # params rows are [x_mm, y_mm, cos(theta), sin(theta)] per robot; the
        # carry order below is (cos, sin, x, y)
        init = (
            params_ref[b, 2],
            params_ref[b, 3],
            params_ref[b, 0],
            params_ref[b, 1],
            jnp.float32(_BIG),
            jnp.bool_(False),
            jnp.float32(0.0),
        )
        if anderson:
            zero = jnp.float32(0.0)
            init = init + (
                zero, zero, zero, zero,                       # prev f
                params_ref[b, 0], params_ref[b, 1],           # prev g = init pose
                params_ref[b, 2], params_ref[b, 3],
                jnp.bool_(False),                             # have_prev
            )

        if early_exit:
            # a real while_loop skips remaining iterations after convergence
            # (typical: ~25 of 50), independently per robot.
            def cond(state):
                i, carry = state
                return jnp.logical_and(i < iters, jnp.logical_not(carry[5]))

            def body(state):
                i, carry = state
                return i + 1, iter_body(i, carry)

            _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
        else:
            final = jax.lax.fori_loop(0, iters, iter_body, init)
        cth, sth, ptx, pty, n_iters = final[0], final[1], final[2], final[3], final[6]

        # final inlier RMSE at the converged pose (Open3D definition)
        tot = jnp.zeros((1, 2), jnp.float32)  # [n_inliers, sum w*d2]
        for blk, start, size in blocks:
            def live_block(start=start, size=size):
                _, _, w, d2, _, _ = block_correspond(start, size, cth, sth, ptx, pty)
                return jnp.dot(
                    jnp.ones((1, size), jnp.float32),
                    jnp.concatenate([w, w * d2], axis=1),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )

            if skip_dead:
                tot = tot + jax.lax.cond(
                    rb_live_ref[b, blk] > 0, live_block, lambda: jnp.zeros((1, 2), jnp.float32)
                )
            else:
                tot = tot + live_block()
        n_in = tot[0, 0]
        rmse = jnp.where(
            n_in > 0,
            jnp.sqrt(tot[0, 1] / jnp.maximum(n_in, 1.0)),
            jnp.float32(_BIG),
        )

        out_ref[b, 0] = ptx
        out_ref[b, 1] = pty
        out_ref[b, 2] = cth
        out_ref[b, 3] = sth
        out_ref[b, 4] = rmse
        out_ref[b, 5] = n_in
        out_ref[b, 6] = n_iters
        out_ref[b, 7] = jnp.float32(0.0)
        return 0

    # STATIC unroll for small batches: a dynamic robot index makes every VMEM
    # read dynamically addressed, which Mosaic lowers much slower (measured
    # 16.3 vs 1.9 us/iteration at B=1); constant indices keep fast addressing.
    # Wide batches (the 64-robot registration benchmark) would unroll the
    # whole while-loop body 64x — compile-time blowup — so they fall back to
    # a dynamic loop.
    if n_robots <= 16:
        for b in range(n_robots):
            robot_body(b, 0)
    else:
        jax.lax.fori_loop(0, n_robots, robot_body, 0)


def _fused_batched(
    src_xy, src_valid, tgt_xy, tgt_valid, init_pose,
    *, iters, threshold_mm, tolerance, early_exit, interpret, tile_t,
    anderson=False,
):
    """Batched core: ``(B, S, 2)/(B, S)/(B, T, 2)/(B, T)/(B, 3)`` ->
    ``(pose (B, 3), rmse (B,), n_inliers (B,), n_iters (B,))``."""
    bsz, s, t = src_xy.shape[0], src_xy.shape[1], tgt_xy.shape[1]
    assert s % 8 == 0 and t % 128 == 0, (s, t)
    if tile_t is None:
        # largest 128-multiple divisor of t up to 2048 (t = 2560 -> 1280, not
        # an assert: the public icp()/register() APIs pad targets to 128 only)
        tile_t = min(t, 2048)
        while t % tile_t:
            tile_t -= 128
    assert t % tile_t == 0, (t, tile_t)

    kernel = functools.partial(
        _icp_kernel, tile_t=tile_t, iters=iters,
        thr2=float(threshold_mm) ** 2, tol=float(tolerance), early_exit=early_exit,
        # liveness skipping rides the early_exit flag: both are per-robot
        # scalar-branch optimisations that pay in every regime
        skip_dead=early_exit, anderson=anderson,
    )
    init_pose = init_pose.astype(jnp.float32)

    # Recentre each problem about its valid-target centroid: |t|^2 drops from
    # arena scale (~2e8 mm^2) to local-spread scale, shrinking the f32 Gram
    # quantum ~10x (fewer spurious ties, better-conditioned moments).  The
    # rigid registration is invariant: solve in the shifted frame, shift the
    # translation back on the way out.
    tvf = tgt_valid.astype(jnp.float32)                       # (B, T)
    n_valid = jnp.maximum(jnp.sum(tvf, axis=1), 1.0)          # (B,)
    cx = jnp.sum(tgt_xy[..., 0].astype(jnp.float32) * tvf, axis=1) / n_valid
    cy = jnp.sum(tgt_xy[..., 1].astype(jnp.float32) * tvf, axis=1) / n_valid
    params = jnp.stack(
        [init_pose[:, 0] - cx, init_pose[:, 1] - cy,
         jnp.cos(init_pose[:, 2]), jnp.sin(init_pose[:, 2])],
        axis=1,
    )  # (B, 4)

    # Gram-form target matrix (XLA, once per registration — amortised over all
    # kernel iterations): rows [-2*tx, -2*ty, |t|^2 + invalid-penalty].  The
    # penalty replaces the per-iteration validity mask inside the kernel.
    txp = tgt_xy[..., 0].astype(jnp.float32) - cx[:, None]
    typ = tgt_xy[..., 1].astype(jnp.float32) - cy[:, None]
    t8 = jnp.stack(
        [-2.0 * txp, -2.0 * typ, txp * txp + typ * typ + (1.0 - tvf) * jnp.float32(_BIG)],
        axis=1,
    )  # (B, 3, T)
    # per-tile and per-source-row-block liveness flags, read as scalars from
    # SMEM inside the kernel
    n_tiles = t // tile_t
    live = jnp.max(tvf.reshape(bsz, n_tiles, tile_t), axis=2).astype(jnp.int32)  # (B, NT)
    svf = src_valid.astype(jnp.float32)
    n_rb = -(-s // _ROW_BLOCK)
    rb_pad = jnp.zeros((bsz, n_rb * _ROW_BLOCK), jnp.float32).at[:, :s].set(svf)
    rb_live = jnp.max(rb_pad.reshape(bsz, n_rb, _ROW_BLOCK), axis=2).astype(jnp.int32)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, 8), jnp.float32),
        # wide batches (the 64-robot benchmark) put ~36 MB of per-robot target
        # matrices on the kernel stack — above the 16 MB default scoped-vmem
        # limit, well under the chip's 128 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        # scalar results live in SMEM (Mosaic can't store scalars to VMEM)
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        interpret=interpret,
    )(
        src_xy.astype(jnp.float32),
        svf.reshape(bsz, s, 1),
        t8,
        live,
        rb_live,
        params,
    )
    theta = jnp.arctan2(out[:, 3], out[:, 2])
    pose = jnp.stack([out[:, 0] + cx, out[:, 1] + cy, theta], axis=1)
    rmse = jnp.where(out[:, 4] >= jnp.float32(_BIG), jnp.float32(jnp.inf), out[:, 4])
    return pose, rmse, out[:, 5].astype(jnp.int32), out[:, 6].astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _fused_call(iters, threshold_mm, tolerance, early_exit, interpret, tile_t, anderson):
    """`custom_vmap`-wrapped single-registration call for one static config.

    The unbatched call runs the kernel at B=1; `vmap` substitutes the batched
    kernel (one instance, internal robot loop) instead of a grid dimension —
    see the module docstring for why that matters on TPU.
    """
    static = dict(
        iters=iters, threshold_mm=threshold_mm, tolerance=tolerance,
        early_exit=early_exit, interpret=interpret, tile_t=tile_t,
        anderson=anderson,
    )

    @jax.custom_batching.custom_vmap
    def call(src_xy, src_valid, tgt_xy, tgt_valid, init_pose):
        pose, rmse, n_in, n_it = _fused_batched(
            src_xy[None], src_valid[None], tgt_xy[None], tgt_valid[None],
            init_pose[None], **static,
        )
        return pose[0], rmse[0], n_in[0], n_it[0]

    @call.def_vmap
    def _rule(axis_size, in_batched, src_xy, src_valid, tgt_xy, tgt_valid, init_pose):
        args = []
        for batched, a in zip(in_batched, (src_xy, src_valid, tgt_xy, tgt_valid, init_pose)):
            args.append(a if batched else jnp.broadcast_to(a[None], (axis_size,) + a.shape))
        outs = _fused_batched(*args, **static)
        return outs, (True, True, True, True)

    return call


def icp_fused_pallas(
    src_xy, src_valid, tgt_xy, tgt_valid, init_pose,
    iters: int = 50, threshold_mm: float = 200.0, tolerance: float = 1e-5,
    early_exit: bool = True, interpret: bool = False, tile_t: int | None = None,
    anderson: bool = False,
):
    """Run the whole gated point-to-point ICP in one kernel.

    Returns ``(pose (3,), rmse, n_inliers, n_iters)``; degenerate-input
    handling (min_points) is the caller's job (`core/registration`).
    `vmap` over any argument batches into a single multi-robot kernel.
    """
    call = _fused_call(
        int(iters), float(threshold_mm), float(tolerance), bool(early_exit),
        bool(interpret), tile_t, bool(anderson),
    )
    return call(src_xy, src_valid, tgt_xy, tgt_valid, init_pose.astype(jnp.float32))
