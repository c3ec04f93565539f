"""Whole-C2f-block megakernel: cv1 + bottleneck(3x3,3x3,+) + cv2 in ONE kernel.

The conv_fused A/B (docs/PERF.md r5) showed per-site Pallas conv fusion wins
1.8-4.5x in isolation but LOSES end-to-end because every pallas<->XLA boundary
costs ~13 us in re-layouts, and XLA overlaps the dispatch the isolated
baselines charged.  The verdict named the only shape that can win: fuse a
whole block so the boundaries drop from ~6 (cv1, 2 bottleneck convs, add,
concat, cv2) to 2 (block in, block out) and the four intermediate tensors
(y, t1, t2, concat) never touch HBM.  This kernel is that experiment for the
v8 C2f with n=1 (c2f_2/c2f_4 in yolo-n — the large-spatial blocks where the
stage wins were biggest).

Dataflow per (batch, row-tile) grid step, all in VMEM:

    x (TH+4 rows with halo)                       # 3-neighbour-block trick
    y  = silu(x @ kron_perm(W1))                  # 1x1, output permuted so
    a, b = y[:, :G*c], y[:, G*c:]                 #   the split is contiguous
    t1 = silu(banded_conv3(b))   (TH+2 rows)      # halo-of-halos
    t2 = silu(banded_conv3(t1))  (TH   rows)
    p  = b + t2                                   # shortcut
    out = silu([a|b|p] @ kron_perm(W2))           # 1x1 over the 3c concat

Out-of-image halo rows are masked to zero after each activation so the
banded 3x3s see exactly XLA's SAME zero padding.  Weights are pre-arranged
host-side: block-diagonal pixel-group kroneckers for the 1x1s (with the
permutations that make split/concat contiguous lane slices) and the
3-group-window banded form of `conv_fused._banded_w3` for the 3x3s.

Like every kernel in this package the layout surgery is HBM-side only:
`(B,H,W,C) -> (B,H,W/G,G*C)` contiguous views, G = `_pack_group(c, c)`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_slam_yolo_tpu.ops.pallas.conv_fused import (
    _auto_interpret,
    _banded_w3,
    _best_tile,
    _pack_group,
)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _w1_perm(w1, b1, g: int, cin: int, c: int):
    """cv1 kron with output columns permuted to [all-pixels a | all-pixels b]:
    column for (pixel p, out-channel co) moves to  p*c+co   if co <  c  (a)
                                            G*c + p*c+co-c  if co >= c (b)."""
    cout = 2 * c
    wk = jnp.zeros((g * cin, g * cout), jnp.float32)
    bk = jnp.zeros((g * cout,), jnp.float32)
    w1 = jnp.asarray(w1, jnp.float32)
    b1 = jnp.asarray(b1, jnp.float32)
    for p in range(g):
        for half in range(2):  # 0: a-columns, 1: b-columns
            dst = half * g * c + p * c
            wk = wk.at[p * cin:(p + 1) * cin, dst:dst + c].set(w1[:, half * c:(half + 1) * c])
            bk = bk.at[dst:dst + c].set(b1[half * c:(half + 1) * c])
    return wk, bk[None, :]


def _w2_perm(w2, b2, g: int, c: int, feat: int):
    """cv2 kron consuming the [a | b | p] block-lane layout: input row for
    (block blk, pixel p, channel ci) sits at blk*G*c + p*c + ci and maps to
    cv2's input channel blk*c + ci for pixel p."""
    wk = jnp.zeros((3 * g * c, g * feat), jnp.float32)
    w2 = jnp.asarray(w2, jnp.float32)
    for blk in range(3):
        for p in range(g):
            src = blk * g * c + p * c
            wk = wk.at[src:src + c, p * feat:(p + 1) * feat].set(w2[blk * c:(blk + 1) * c, :])
    bk = jnp.tile(jnp.asarray(b2, jnp.float32), g)
    return wk, bk[None, :]


def _banded3(r, wb, b, rows: int, wg: int, gc: int):
    """3x3 SAME conv via the 3-group-window banded matmul on a VMEM value.
    ``r``: (rows+2, wg, gc) input incl. one halo row each side; returns
    silu(conv)+bias as (rows, wg, gc) f32."""
    zg = jnp.zeros((rows, 1, gc), r.dtype)
    acc = jnp.zeros((rows * wg, gc), jnp.float32)
    for dy in range(3):
        rr = r[dy:dy + rows]
        lhs = jnp.concatenate(
            [
                jnp.concatenate([zg, rr[:, : wg - 1]], axis=1),
                rr,
                jnp.concatenate([rr[:, 1:], zg], axis=1),
            ],
            axis=-1,
        )
        acc += jnp.dot(lhs.reshape(rows * wg, 3 * gc), wb[dy],
                       preferred_element_type=jnp.float32)
    return _silu(acc + b).reshape(rows, wg, gc)


def _c2f_kernel(xm_ref, x_ref, xp_ref, w1_ref, b1_ref, wb1_ref, bb1_ref,
                wb2_ref, bb2_ref, w2_ref, b2_ref, o_ref, *,
                th, wg, gcin, gc, gf, h_tiles, shortcut):
    i = pl.program_id(1)
    dt = x_ref.dtype

    # (TH+4, Wg, GCin) slab: two halo rows each side from the neighbour blocks
    top = jnp.where(i > 0, xm_ref[0, th - 2:], jnp.zeros_like(xm_ref[0, :2]))
    bot = jnp.where(i < h_tiles - 1, xp_ref[0, :2], jnp.zeros_like(xp_ref[0, :2]))
    x4 = jnp.concatenate([top, x_ref[0], bot], axis=0)

    # cv1 (1x1) on all TH+4 rows; zero the out-of-image halo rows so the 3x3s
    # below see SAME zero padding, not silu(bias)
    y = _silu(
        jnp.dot(x4.reshape((th + 4) * wg, gcin), w1_ref[:],
                preferred_element_type=jnp.float32)
        + b1_ref[:]
    )
    row = jax.lax.broadcasted_iota(jnp.int32, ((th + 4) * wg, 1), 0) // wg
    gr = row + i * th - 2                      # global image row of each slab row
    y = jnp.where((gr >= 0) & (gr < h_tiles * th), y, 0.0)

    a = y[:, : gc].reshape(th + 4, wg, gc).astype(dt)
    b = y[:, gc:].reshape(th + 4, wg, gc).astype(dt)

    t1 = _banded3(b, wb1_ref, bb1_ref[:], th + 2, wg, gc)
    # zero t1's out-of-image rows (they feed t2's edge taps)
    r1 = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0) + i * th - 1
    t1 = jnp.where((r1 >= 0) & (r1 < h_tiles * th), t1, 0.0).astype(dt)
    t2 = _banded3(t1, wb2_ref, bb2_ref[:], th, wg, gc)

    p = b[2:th + 2].astype(jnp.float32) + t2 if shortcut else t2
    cc = jnp.concatenate(
        [
            a[2:th + 2].reshape(th * wg, gc),
            b[2:th + 2].reshape(th * wg, gc),
            p.reshape(th * wg, gc).astype(dt),
        ],
        axis=-1,
    ).astype(dt)
    out = _silu(jnp.dot(cc, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:])
    o_ref[0] = out.reshape(th, wg, gf).astype(dt)


def c2f_interceptor(next_fun, args, kwargs, context, cache=None):
    """`flax.linen.intercept_methods` hook replacing every supported folded
    n=1 C2f forward with the megakernel.  Composes with
    `conv_fused.pallas_cba_interceptor` — but a C2f swallowed here never
    reaches the per-site hook, so its internal ConvBnActs can't be
    double-intercepted.  Unsupported blocks (n>1, unpackable widths,
    throughput batches, training) fall through to stock flax.

    ``cache``: {block name -> (arranged numpy weights, shortcut)} precomputed
    by `Detector` via `arrange_c2f_weights` — the arranged matrices become
    XLA constants instead of per-call in-trace scatter assembly (which cost
    2.5x the kernel's own win, docs/PERF.md r5).  Without a cache the
    arrangement is built in-trace — fine for tests, not for serving."""
    from icp_slam_yolo_tpu.models.yolo import C2f
    from icp_slam_yolo_tpu.ops.pallas.conv_fused import _use_pallas

    mod = context.module
    train = kwargs.get("train", args[1] if len(args) > 1 else False)
    if (not isinstance(mod, C2f) or context.method_name != "__call__"
            or not mod.folded or train or mod.n != 1):
        return next_fun(*args, **kwargs)
    x = args[0]
    if x.ndim != 4 or not _use_pallas(int(x.shape[0]), int(x.shape[1])):
        return next_fun(*args, **kwargs)
    p = mod.variables["params"]
    try:
        cv1 = p["ConvBnAct_0"]["Conv_0"]
        m0a = p["Bottleneck_0"]["ConvBnAct_0"]["Conv_0"]
        m0b = p["Bottleneck_0"]["ConvBnAct_1"]["Conv_0"]
        cv2 = p["ConvBnAct_1"]["Conv_0"]
    except KeyError:
        return next_fun(*args, **kwargs)
    c = mod.features // 2
    g = _pack_group(c, c)
    if x.shape[2] % g or int(x.shape[1]) < 4:
        return next_fun(*args, **kwargs)
    name = mod.path[-1] if mod.path else mod.name
    arranged = None
    shortcut = bool(mod.shortcut)
    if cache is not None:
        entry = cache.get(name)
        if entry is None:
            return next_fun(*args, **kwargs)  # never assemble in-trace when serving
        arranged, shortcut = entry
    dt = mod.dtype
    return c2f_fused(
        x.astype(dt),
        cv1["kernel"][0, 0].astype(dt), cv1["bias"].astype(dt),
        m0a["kernel"].astype(dt), m0a["bias"].astype(dt),
        m0b["kernel"].astype(dt), m0b["bias"].astype(dt),
        cv2["kernel"][0, 0].astype(dt), cv2["bias"].astype(dt),
        shortcut=shortcut, arranged=arranged,
    )


def arrange_c2f_weights(w1, b1, wm1, bm1, wm2, bm2, w2, b2, g: int, dtype):
    """Host-side weight arrangement for `c2f_fused`: the permuted kron for
    cv1/cv2 and the banded window form for the bottleneck 3x3s.

    MUST be called on CONCRETE arrays outside jit when serving (Detector
    caches the result per block at load time): built in-trace from traced
    params, these ~10^2 small scatter ops per block cost more than the
    megakernel saves — the r5 e2e measurement that killed the in-trace
    variant (off 767 vs fused 291 ticks/s at b2, docs/PERF.md)."""
    cin = w1.shape[0]
    c = w1.shape[1] // 2
    feat = w2.shape[1]
    w1k, b1k = _w1_perm(w1, b1, g, cin, c)
    wb1 = jnp.stack([_banded_w3(jnp.asarray(wm1, jnp.float32), g, c, c, dy) for dy in range(3)])
    wb2 = jnp.stack([_banded_w3(jnp.asarray(wm2, jnp.float32), g, c, c, dy) for dy in range(3)])
    w2k, b2k = _w2_perm(w2, b2, g, c, feat)
    w1k, wb1, wb2, w2k = (a.astype(dtype) for a in (w1k, wb1, wb2, w2k))
    bm1k = jnp.tile(jnp.asarray(bm1, jnp.float32), g)[None, :]
    bm2k = jnp.tile(jnp.asarray(bm2, jnp.float32), g)[None, :]
    return w1k, b1k, wb1, bm1k, wb2, bm2k, w2k, b2k


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret", "shortcut"))
def c2f_fused(x, w1, b1, wm1, bm1, wm2, bm2, w2, b2,
              tile_h: int = 32, interpret: bool = False, shortcut: bool = True,
              arranged=None):
    """Fused v8 `C2f(features, n=1)` forward (folded weights).

    x: (B, H, W, Cin);  w1: (Cin, 2c);  wm1/wm2: (3, 3, c, c) bottleneck
    convs;  w2: (3c, F).  ``shortcut=False`` is the neck variant (concat
    [a, b, t2] instead of [a, b, b+t2]).  Returns (B, H, W, F) in x.dtype.
    Pass ``arranged=arrange_c2f_weights(...)`` (precomputed host-side) on
    any hot path — see that function's docstring.
    """
    bsz, h, wd, cin = x.shape
    c = w1.shape[1] // 2
    feat = w2.shape[1]
    g = _pack_group(c, c)
    if wd % g or cin * g % 8:
        raise ValueError(f"width {wd} not packable by G={g}")
    wg = wd // g
    tile_h = _best_tile(h, min(tile_h, h), mult=4)
    if tile_h < 2:
        raise ValueError(f"height {h} too small for the 2-row halo")
    gcin, gc, gf = g * cin, g * c, g * feat

    xg = x.reshape(bsz, h, wg, gcin)
    dt = x.dtype
    if arranged is None:
        arranged = arrange_c2f_weights(w1, b1, wm1, bm1, wm2, bm2, w2, b2, g, dt)
    w1k, b1k, wb1, bm1k, wb2, bm2k, w2k, b2k = arranged

    kern = functools.partial(_c2f_kernel, th=tile_h, wg=wg, gcin=gcin, gc=gc,
                             gf=gf, h_tiles=h // tile_h, shortcut=shortcut)

    def blk(off):
        return pl.BlockSpec(
            (1, tile_h, wg, gcin),
            lambda bi, ti: (bi, jnp.clip(ti + off, 0, h // tile_h - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    full = lambda shape: pl.BlockSpec(shape, lambda bi, ti: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bsz, h, wg, gf), dt),
        grid=(bsz, h // tile_h),
        in_specs=[
            blk(-1), blk(0), blk(1),
            full((gcin, 2 * gc)), full((1, 2 * gc)),
            full((3, 3 * gc, gc)), full((1, gc)),
            full((3, 3 * gc, gc)), full((1, gc)),
            full((3 * gc, gf)), full((1, gf)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, wg, gf), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=_auto_interpret(interpret),
    )(xg, xg, xg, w1k, b1k, wb1, bm1k, wb2, bm2k, w2k, b2k)
    return out.reshape(bsz, h, wd, feat)
