"""Fused nearest-neighbour Pallas kernel: distance + running argmin in VMEM.

The XLA path materialises the full ``(S, T)`` squared-distance matrix in HBM
(512 x 16384 x 4 B = 33 MB per ICP iteration) and re-reads it for the argmin —
the pipeline is HBM-bandwidth bound on exactly that traffic.  This kernel tiles
the target into VMEM-sized blocks, computes distances in the numerically-stable
difference form ``(sx - tx)^2 + (sy - ty)^2`` (no catastrophic cancellation, so
no centering pass needed), and keeps only the running per-source min/argmin —
the distance matrix never exists outside VMEM.

Mosaic notes: the target is passed transposed ``(2, T)`` and the mask as
``(1, T)`` so every slice stays 2-D with the lane dimension last; the argmin is
a manual iota-min (first-index tie-break, same as ``np.argmin``).

Semantics match `ops/nn.nearest_neighbor`: invalid targets are excluded, ties
resolve to the lowest index, distances are in the input units.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # plain python float: jnp constants would be captured tracers in the kernel
_LANE = 128


def _nn_kernel(src_ref, tgt_t_ref, valid_t_ref, dist_ref, idx_ref, *, tile_t: int):
    """src (S, 2) f32; tgt_t (2, T) f32; valid_t (1, T) f32 — VMEM-resident.

    Writes per-source min squared distance (S, 1) and argmin index (S, 1).
    """
    s = src_ref.shape[0]
    t = tgt_t_ref.shape[1]
    n_tiles = t // tile_t

    sx = src_ref[:, 0:1]  # (S, 1)
    sy = src_ref[:, 1:2]
    col = jax.lax.broadcasted_iota(jnp.int32, (s, tile_t), 1)

    def body(k, carry):
        run_min, run_arg = carry
        tx = tgt_t_ref[0:1, pl.ds(k * tile_t, tile_t)]    # (1, TT)
        ty = tgt_t_ref[1:2, pl.ds(k * tile_t, tile_t)]
        tv = valid_t_ref[0:1, pl.ds(k * tile_t, tile_t)]
        dx = sx - tx  # (S, TT)
        dy = sy - ty
        d2 = dx * dx + dy * dy
        d2 = jnp.where(tv > 0, d2, _BIG)
        tile_min = jnp.min(d2, axis=1, keepdims=True)                       # (S, 1)
        is_min = d2 <= tile_min
        tile_arg = jnp.min(jnp.where(is_min, col, t), axis=1, keepdims=True) + k * tile_t
        better = tile_min < run_min
        return jnp.where(better, tile_min, run_min), jnp.where(better, tile_arg, run_arg)

    init = (jnp.full((s, 1), jnp.float32(_BIG)), jnp.zeros((s, 1), jnp.int32))
    run_min, run_arg = jax.lax.fori_loop(0, n_tiles, body, init)
    dist_ref[:, :] = run_min
    idx_ref[:, :] = run_arg


def nn_argmin_pallas(src_xy, tgt_xy, tgt_valid, interpret: bool = False):
    """Per-source nearest valid target: ``(min_sqdist (S,), argmin (S,))``.

    S must be a multiple of 8 and T of 128 (the pipeline's static shapes are).
    """
    s, t = src_xy.shape[0], tgt_xy.shape[0]
    assert s % 8 == 0 and t % _LANE == 0, (s, t)
    tile_t = min(t, 2048)

    kernel = functools.partial(_nn_kernel, tile_t=tile_t)
    d2, idx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, 1), jnp.float32),
            jax.ShapeDtypeStruct((s, 1), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(
        src_xy.astype(jnp.float32),
        tgt_xy.astype(jnp.float32).T,
        tgt_valid.astype(jnp.float32).reshape(1, t),
    )
    return d2[:, 0], idx[:, 0]
