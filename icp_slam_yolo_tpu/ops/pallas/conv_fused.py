"""Fused conv + bias + SiLU Pallas kernels for the detect hot stages.

Why these exist: the r4 epilogue-fusion probe (docs/PERF.md, scripts/
fusion_probe.py) showed XLA's TPU conv emitter takes NO elementwise output
fusion — every ConvBnAct's SiLU runs as a separate HBM round trip over the
activation tensor, and at small batch each extra kernel also pays a ~20-40 us
launch floor.  The BN affine is already folded into the conv at load time
(`models/yolo.fold_batchnorm`); these kernels fold the *activation* in too,
so a ConvBnAct is ONE kernel: read input, matmul, +bias, SiLU, write output.

Layout strategy (the whole game at yolo-n's channel widths of 3..256):
all shape surgery happens on the HBM side via free `reshape`s of contiguous
NHWC buffers — the kernel never performs a lane<->sublane relayout in VMEM.

* 1x1 conv: `(B,H,W,C)` viewed as `(B*H*W/G, G*Cin)` packs G pixels per row
  so the matmul LHS has full 128 lanes; the weight becomes `kron(I_G, W)`
  (`(G*Cin, G*Cout)`), i.e. a block-diagonal matmul whose off-diagonal zero
  FLOPs are free on an HBM-bound op.  One matmul + epilogue per grid step.

Reference stages (docs/roofline_detect.json): c2f_2/cv1 and every other 1x1
ConvBnAct in the C2f/neck stacks.  3x3 stages (stem/down2) are measured via
`scripts/conv_fused_ab.py`; see PERF.md for the A/B verdict before wiring
any of this into `models/yolo.py`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_group(cin: int, cout: int, lanes: int = 128) -> int:
    """Smallest pixel-group G making both G*cin and G*cout lane multiples."""
    g = lanes // math.gcd(cin, lanes)
    g2 = lanes // math.gcd(cout, lanes)
    return (g * g2) // math.gcd(g, g2)


def _best_tile(n: int, cap: int, mult: int = 8) -> int:
    """Largest divisor of ``n`` that is <= cap and a multiple of ``mult``
    (fall back to the largest divisor <= cap).  Each grid step costs ~0.8 us
    of fixed overhead on v5e (measured, scripts/conv_fused_ab.py), so tiles
    should be as large as VMEM allows — a naive halving search can collapse
    to tiny tiles (12800 % 1024 -> 512 -> ... -> 256) and 4x the step count."""
    best = 1
    for t in range(min(n, cap), 0, -1):
        if n % t == 0 and (t % mult == 0 or t == n):
            return t
        if n % t == 0 and best == 1:
            best = t
    return best


def _conv1x1_kernel(x_ref, w_ref, b_ref, o_ref, *, act=True):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    if act:
        acc = acc * jax.nn.sigmoid(acc)
    o_ref[:] = acc.astype(o_ref.dtype)


def _auto_interpret(interpret: bool) -> bool:
    """Pallas interpret mode on the CPU test backend, compiled on TPU."""
    return interpret or jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret", "act"))
def conv1x1_silu(x, w, b, tile_m: int = 4096, interpret: bool = False,
                 act: bool = True):
    """``silu(x @ w + b)`` over the channel axis of an NHWC tensor, one kernel.

    x: (B, H, W, Cin) bf16/f32;  w: (Cin, Cout);  b: (Cout,).
    Returns (B, H, W, Cout) in x.dtype.  B*H*W must divide the pixel-group
    packing (true for every 640/1024-px detect shape).
    """
    bsz, h, wd, cin = x.shape
    cout = w.shape[1]
    g = _pack_group(cin, cout)
    if (g * cin > 512 or bsz * h * wd % g or (bsz * h * wd // g) % 8):
        # unpackable, or the pack row would be absurdly wide (the 1-class
        # head conv wants g=128 -> 8192-lane rows, a 25 MB VMEM block):
        # plain (pix, Cin) rows instead
        g = 1
    m = bsz * h * wd // g
    if m % 8:
        raise ValueError(f"pixel count {bsz*h*wd} not tileable")
    # VMEM cap: in+out tile pairs (double-buffered) must fit comfortably
    max_rows = max(8, (4 * 2 ** 20) // ((g * cin + g * cout) * 2))
    tile_m = _best_tile(m, min(tile_m, m, max_rows))

    xf = x.reshape(m, g * cin)                       # free: contiguous view
    eye = jnp.eye(g, dtype=w.dtype)
    wk = jnp.einsum("gh,io->giho", eye, w).reshape(g * cin, g * cout)
    bk = jnp.tile(b, g)[None, :]                     # (1, G*Cout)

    out = pl.pallas_call(
        functools.partial(_conv1x1_kernel, act=act),
        out_shape=jax.ShapeDtypeStruct((m, g * cout), x.dtype),
        grid=(m // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, g * cin), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g * cin, g * cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, g * cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_auto_interpret(interpret),
    )(xf, wk, bk)
    return out.reshape(bsz, h, wd, cout)


# ---------------------------------------------------------------------------
# 3x3 stride-1 conv + bias + SiLU (the 32 C2f-bottleneck/head-branch sites,
# ~32% of perfect-fusion SoL time)


def _banded_w3(w, g: int, cin: int, cout: int, dy: int):
    """Per-dy block-banded weight: rows = 3 consecutive pixel GROUPS (3*G*Cin),
    cols = the centre group's outputs (G*Cout).  Row block (t, c) maps tap
    pixel t in the 3G window; out pixel o (in the centre group) uses taps
    t = G + o + dx - 1, dx in {0,1,2}."""
    wb = jnp.zeros((3 * g * cin, g * cout), w.dtype)
    for o in range(g):
        for dx in range(3):
            t = g + o + dx - 1
            wb = wb.at[t * cin:(t + 1) * cin, o * cout:(o + 1) * cout].set(w[dy, dx])
    return wb


def _conv3x3_kernel(xm_ref, x_ref, xp_ref, w_ref, b_ref, o_ref, *, th, wg, gcin, gcout):
    """One (batch, row-tile) step.  xm/x/xp are the previous/current/next
    row-tile blocks (halo rows come from the neighbours; their re-read is v0's
    known 3x traffic cost).  Contraction: per dy, lane-concat the 3 group
    windows into (TH*Wg, 3*G*Cin) and hit one banded matmul."""
    i = pl.program_id(1)
    last = pl.num_programs(1) - 1

    cur = x_ref[0]                                     # (TH, Wg, GCin)
    # rows shifted by dy-1: dy=0 needs the previous block's last row (zero at
    # the image top), dy=2 the next block's first row (zero at the bottom)
    top = jnp.where(i > 0, xm_ref[0, th - 1:th], jnp.zeros_like(xm_ref[0, :1]))
    bot = jnp.where(i < last, xp_ref[0, :1], jnp.zeros_like(xp_ref[0, :1]))
    rows = {
        0: jnp.concatenate([top, cur[: th - 1]], axis=0),
        1: cur,
        2: jnp.concatenate([cur[1:], bot], axis=0),
    }

    zg = jnp.zeros((th, 1, gcin), cur.dtype)           # x-edge halo group
    acc = jnp.zeros((th * wg, gcout), jnp.float32)
    for dy in range(3):
        r = rows[dy]                                   # (TH, Wg, GCin)
        lhs = jnp.concatenate(
            [
                jnp.concatenate([zg, r[:, : wg - 1]], axis=1),   # group x-1
                r,                                               # group x
                jnp.concatenate([r[:, 1:], zg], axis=1),         # group x+1
            ],
            axis=-1,
        )
        acc += jnp.dot(
            lhs.reshape(th * wg, 3 * gcin),
            w_ref[dy],
            preferred_element_type=jnp.float32,
        )
    acc = acc + b_ref[:].astype(jnp.float32)
    y = acc * jax.nn.sigmoid(acc)
    o_ref[0] = y.reshape(th, wg, gcout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def conv3x3_silu(x, w, b, tile_h: int = 32, interpret: bool = False):
    """``silu(conv3x3_same(x, w) + b)``, stride 1, one fused kernel.

    x: (B, H, W, Cin);  w: (3, 3, Cin, Cout) HWIO;  b: (Cout,).
    Pixel groups of G = lcm-pack(Cin, Cout) keep DMA and matmul lanes full;
    the x-halo lives inside the row slab (groups shifted by whole-group
    windows), the y-halo comes from the neighbouring row-tile blocks.
    """
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    g = _pack_group(cin, cout)
    if wd % g:
        raise ValueError(f"width {wd} not divisible by pixel group {g}")
    wg = wd // g
    tile_h = _best_tile(h, min(tile_h, h), mult=4)

    gcin, gcout = g * cin, g * cout
    xg = x.reshape(bsz, h, wg, gcin)                   # free: contiguous view
    wb = jnp.stack([_banded_w3(w, g, cin, cout, dy) for dy in range(3)])
    bk = jnp.tile(b, g)[None, :]

    kern = functools.partial(_conv3x3_kernel, th=tile_h, wg=wg, gcin=gcin, gcout=gcout)

    def blk(off):
        return pl.BlockSpec(
            (1, tile_h, wg, gcin),
            lambda bi, ti: (bi, jnp.clip(ti + off, 0, h // tile_h - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bsz, h, wg, gcout), x.dtype),
        grid=(bsz, h // tile_h),
        in_specs=[
            blk(-1), blk(0), blk(1),
            pl.BlockSpec((3, 3 * gcin, gcout), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gcout), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, wg, gcout),
                               lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM),
        interpret=_auto_interpret(interpret),
    )(xg, xg, xg, wb, bk)
    return out.reshape(bsz, h, wd, cout)


# ---------------------------------------------------------------------------
# 3x3 stride-2 conv + bias + SiLU (stem/down2-5/pan_d* — the 7 downsample
# sites).  Exists so the full-Pallas conv path has NO XLA conv adjacent to a
# pallas boundary: XLA satisfies a custom-call's default-layout operand by
# assigning the *producing conv* a lane-hostile layout (measured: the stem
# conv went 95 -> 742 us next to the C2f megakernel — docs/PERF.md r5).


def _banded_w3s2(w, q: int, cin: int, cout: int, dy: int):
    """Per-dy banded weight for stride 2: rows = a 2-in-group window (each in
    group = 2Q input pixels), cols = Q output pixels.  Tap pixel t in the 4Q
    window serves out pixel q via t = 2Q + 2q + dx - 1."""
    wb = jnp.zeros((4 * q * cin, q * cout), w.dtype)
    for o in range(q):
        for dx in range(3):
            t = 2 * q + 2 * o + dx - 1
            wb = wb.at[t * cin:(t + 1) * cin, o * cout:(o + 1) * cout].set(w[dy, dx])
    return wb


def _conv3x3s2_kernel(xm_ref, x_ref, xp_ref, w_ref, b_ref, o_ref, *,
                      th, wg, gcin2, qcout):
    """One (batch, out-row-tile) step; in blocks hold 2*TH input rows."""
    i = pl.program_id(1)
    last = pl.num_programs(1) - 1

    top = jnp.where(i > 0, xm_ref[0, -1:], jnp.zeros_like(xm_ref[0, :1]))
    bot = jnp.where(i < last, xp_ref[0, :1], jnp.zeros_like(xp_ref[0, :1]))
    slab = jnp.concatenate([top, x_ref[0], bot], axis=0)      # (2TH+2, Wg, 2QCin)
    rs = slab.reshape(th + 1, 2, wg, gcin2)
    rows = {0: rs[:th, 0], 1: rs[:th, 1], 2: rs[1:, 0]}       # in row 2j+dy-1

    zg = jnp.zeros((th, 1, gcin2), slab.dtype)
    acc = jnp.zeros((th * wg, qcout), jnp.float32)
    for dy in range(3):
        r = rows[dy]                                          # (TH, Wg, 2QCin)
        lhs = jnp.concatenate(
            [jnp.concatenate([zg, r[:, : wg - 1]], axis=1), r], axis=-1)
        acc += jnp.dot(lhs.reshape(th * wg, 2 * gcin2), w_ref[dy],
                       preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    y = acc * jax.nn.sigmoid(acc)
    o_ref[0] = y.reshape(th, wg, qcout).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def conv3x3s2_silu(x, w, b, tile_h: int = 16, interpret: bool = False):
    """``silu(conv3x3_stride2_same(x, w) + b)``, one fused kernel.

    x: (B, H, W, Cin) with H, W even;  w: (3, 3, Cin, Cout) HWIO;
    b: (Cout,).  Returns (B, H/2, W/2, Cout).  Output pixel groups of Q
    (Q*Cout lane-aligned) pair with input groups of 2Q pixels, so the x-taps
    live in a 2-group window and the y-taps in paired slab rows."""
    bsz, h, wd, cin = x.shape
    cout = w.shape[-1]
    if h % 2 or wd % 2:
        raise ValueError("stride-2 kernel requires even H and W")
    q = _pack_group(cout, cout)
    h_out, w_out = h // 2, wd // 2
    if w_out % q:
        raise ValueError(f"output width {w_out} not divisible by Q={q}")
    wg = w_out // q
    tile_h = _best_tile(h_out, min(tile_h, h_out), mult=4)
    gcin2, qcout = 2 * q * cin, q * cout

    xg = x.reshape(bsz, h, wg, gcin2)                         # free view
    wb = jnp.stack([_banded_w3s2(w, q, cin, cout, dy) for dy in range(3)])
    bk = jnp.tile(b, q)[None, :]

    kern = functools.partial(_conv3x3s2_kernel, th=tile_h, wg=wg,
                             gcin2=gcin2, qcout=qcout)

    def blk(off):
        # a block of 2*tile_h INPUT rows per out-row-tile index
        return pl.BlockSpec(
            (1, 2 * tile_h, wg, gcin2),
            lambda bi, ti: (bi, jnp.clip(ti + off, 0, h_out // tile_h - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bsz, h_out, wg, qcout), x.dtype),
        grid=(bsz, h_out // tile_h),
        in_specs=[
            blk(-1), blk(0), blk(1),
            pl.BlockSpec((3, 4 * q * cin, qcout), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qcout), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, wg, qcout),
                               lambda bi, ti: (bi, ti, 0, 0), memory_space=pltpu.VMEM),
        interpret=_auto_interpret(interpret),
    )(xg, xg, xg, wb, bk)
    return out.reshape(bsz, h_out, w_out, cout)


# Regime gate, measured END-TO-END on v5e with the full-Pallas conv path
# (docs/PERF.md r5 "full-Pallas conv path"; per-stage numbers in
# docs/conv_fused_ab.json).  detect FPS off -> on:
#   b2 stereo tick: 900 -> 1550/s (1.7-1.9x)   b8: 1255 -> 4707 (3.75x)
#   b16: 1495 -> 3045 (2.0x)                    b32: 1830 -> 2418 (1.3x)
#   b128: 6981 -> 2140 (0.31x — grid-step overhead scales with batch;
#        throughput regime stays on the XLA emitter)
# MIN_H: at b8, keeping the deep small-spatial sites on XLA measured 5130
# vs 3005 FPS all-Pallas; at b<=2 even tiny sites hold parity, so the
# spatial cutoff only applies above SMALL_BATCH.
PALLAS_CONV_MAX_BATCH = 32
PALLAS_CONV_MIN_H = 80
PALLAS_CONV_SMALL_BATCH = 2


def _use_pallas(batch: int, h: int) -> bool:
    if batch > PALLAS_CONV_MAX_BATCH:
        return False
    return batch <= PALLAS_CONV_SMALL_BATCH or h >= PALLAS_CONV_MIN_H


def pallas_cba_interceptor(next_fun, args, kwargs, context):
    """`flax.linen.intercept_methods` hook replacing every supported folded
    ConvBnAct forward with the one-kernel fused conv+bias+SiLU — no param-tree
    change, no model edit.  Unsupported configs (stride 2, unpackable widths,
    training mode, throughput-regime batches) fall through to the stock flax
    path."""
    from icp_slam_yolo_tpu.models.yolo import ConvBnAct

    import flax.linen as nn

    mod = context.module
    if context.method_name != "__call__":
        return next_fun(*args, **kwargs)
    x = args[0] if args else None
    if (not hasattr(x, "ndim") or x.ndim != 4
            or not _use_pallas(int(x.shape[0]), int(x.shape[1]))):
        return next_fun(*args, **kwargs)

    if isinstance(mod, nn.Conv):
        # plain 1x1 projection (head outputs, attention qkv): conv w/o act.
        # ConvBnActs handled below never reach here (their branch does not
        # call next_fun); a fallen-through ConvBnAct's inner conv DOES land
        # here, keeping XLA convs away from pallas boundaries either way.
        ks = tuple(mod.kernel_size) if not isinstance(mod.kernel_size, int) else (mod.kernel_size,) * 2
        st = mod.strides or 1
        st = (st, st) if isinstance(st, int) else tuple(st)
        if (ks != (1, 1) or st != (1, 1)
                or (getattr(mod, "feature_group_count", 1) or 1) != 1):
            return next_fun(*args, **kwargs)
        p = mod.variables["params"]
        w = p["kernel"]
        cin, cout = int(w.shape[-2]), int(w.shape[-1])
        npix = x.shape[0] * x.shape[1] * x.shape[2]
        if npix % 8:
            return next_fun(*args, **kwargs)
        b = p.get("bias")
        b = jnp.zeros((cout,), w.dtype) if b is None else b
        dt = mod.dtype or x.dtype
        return conv1x1_silu(x.astype(dt), w[0, 0].astype(dt), b.astype(dt), act=False)

    train = kwargs.get("train", args[1] if len(args) > 1 else False)
    if (not isinstance(mod, ConvBnAct) or not mod.folded or train
            or (mod.kernel, mod.stride) not in ((1, 1), (3, 1), (3, 2))):
        return next_fun(*args, **kwargs)
    p = mod.variables["params"]["Conv_0"]
    w, b = p["kernel"], p["bias"]
    cin, cout = int(w.shape[-2]), int(w.shape[-1])
    npix = x.shape[0] * x.shape[1] * x.shape[2]
    if mod.kernel == 3 and mod.stride == 2:
        q = _pack_group(cout, cout)
        if (x.shape[1] % 2 or x.shape[2] % 2 or (x.shape[2] // 2) % q
                or x.shape[1] < 2):
            return next_fun(*args, **kwargs)
    else:
        g = _pack_group(cin, cout)
        if x.shape[2] % g or npix % g or (npix // g) % 8:
            return next_fun(*args, **kwargs)
    x = x.astype(mod.dtype)
    w = w.astype(mod.dtype)
    b = b.astype(mod.dtype)
    if mod.kernel == 1:
        return conv1x1_silu(x, w[0, 0], b)
    if mod.stride == 2:
        return conv3x3s2_silu(x, w, b)
    return conv3x3_silu(x, w, b)


# bench hooks for scripts/conv_fused_ab.py


def make_bench_stage(name: str, spec, batch: int):
    """Return make_prog(n_calls) for the Pallas variant of a stage, or None."""
    cin, cout, k, s, h = spec
    if k == 3 and s != 1:
        return None  # stride-2 stages: see PERF.md for the measured verdict
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.bfloat16)
    if k == 1:
        w = jnp.asarray(rng.standard_normal((cin, cout)) * 0.1, jnp.bfloat16)
        op = conv1x1_silu
    else:
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.bfloat16)
        op = conv3x3_silu

    def make_prog(n_calls):
        x = jnp.asarray(rng.standard_normal((batch, h, h, cin)), jnp.bfloat16)

        @jax.jit
        def prog(x):
            def body(i, acc):
                y = op(x + acc * jnp.bfloat16(1e-6), w, b)
                return jnp.mean(y).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, n_calls, body, jnp.bfloat16(0.0))

        return prog, x

    return make_prog
