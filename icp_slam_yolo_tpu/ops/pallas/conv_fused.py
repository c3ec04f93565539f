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


def _conv1x1_kernel(x_ref, w_ref, b_ref, o_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    acc = acc + b_ref[:].astype(jnp.float32)
    o_ref[:] = (acc * jax.nn.sigmoid(acc)).astype(o_ref.dtype)


def _auto_interpret(interpret: bool) -> bool:
    """Pallas interpret mode on the CPU test backend, compiled on TPU."""
    return interpret or jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def conv1x1_silu(x, w, b, tile_m: int = 4096, interpret: bool = False):
    """``silu(x @ w + b)`` over the channel axis of an NHWC tensor, one kernel.

    x: (B, H, W, Cin) bf16/f32;  w: (Cin, Cout);  b: (Cout,).
    Returns (B, H, W, Cout) in x.dtype.  B*H*W must divide the pixel-group
    packing (true for every 640/1024-px detect shape).
    """
    bsz, h, wd, cin = x.shape
    cout = w.shape[1]
    g = _pack_group(cin, cout)
    m = bsz * h * wd // g
    if bsz * h * wd % g or m % 8:
        raise ValueError(f"pixel count {bsz*h*wd} not packable by G={g}")
    tile_m = _best_tile(m, min(tile_m, m))

    xf = x.reshape(m, g * cin)                       # free: contiguous view
    eye = jnp.eye(g, dtype=w.dtype)
    wk = jnp.einsum("gh,io->giho", eye, w).reshape(g * cin, g * cout)
    bk = jnp.tile(b, g)[None, :]                     # (1, G*Cout)

    out = pl.pallas_call(
        _conv1x1_kernel,
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
# model integration: swap folded ConvBnAct calls for the fused kernels


# Regime gate, measured on v5e (docs/conv_fused_ab.json, tuned tiles):
#   b2  (serving stereo pair): 0.97-4.5x per stage — Pallas everywhere.
#   b8  (camera burst): 1.78-3.16x at H>=80; 0.59x at H=40 — Pallas only on
#        the large-spatial sites.
#   b128 (throughput): XLA's conv emitter sits at the bandwidth roof and the
#        ~0.8 us/grid-step overhead makes Pallas lose 3-13x — XLA everywhere.
PALLAS_CONV_MAX_BATCH = 8
PALLAS_CONV_MIN_H = 80          # spatial cutoff for batches > _SMALL_BATCH
PALLAS_CONV_SMALL_BATCH = 2     # at stereo-pair batch even tiny sites hold parity


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

    mod = context.module
    train = kwargs.get("train", args[1] if len(args) > 1 else False)
    if (not isinstance(mod, ConvBnAct) or context.method_name != "__call__"
            or not mod.folded or train):
        return next_fun(*args, **kwargs)
    x = args[0]
    if (x.ndim != 4 or not _use_pallas(int(x.shape[0]), int(x.shape[1]))
            or (mod.kernel, mod.stride) not in ((1, 1), (3, 1))):
        return next_fun(*args, **kwargs)
    p = mod.variables["params"]["Conv_0"]
    w, b = p["kernel"], p["bias"]
    cin, cout = int(w.shape[-2]), int(w.shape[-1])
    g = _pack_group(cin, cout)
    npix = x.shape[0] * x.shape[1] * x.shape[2]
    if x.shape[2] % g or npix % g or (npix // g) % 8:
        return next_fun(*args, **kwargs)
    x = x.astype(mod.dtype)
    w = w.astype(mod.dtype)
    b = b.astype(mod.dtype)
    if mod.kernel == 1:
        return conv1x1_silu(x, w[0, 0], b)
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
