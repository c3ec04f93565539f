"""Masked voxel-grid downsampling with static shapes.

Replaces Open3D ``voxel_down_sample`` (`gicp_lidar.py:8-11`,
`process.py:68-73`) — and matches its segment-*mean* semantics — without any
dynamic output shape: the result stays ``(N, 2)`` with a validity mask where
exactly one representative per occupied voxel is valid.

Divergence note (documented per SURVEY.md section 7): Open3D anchors the voxel
grid at the cloud's min-bound (data-dependent); we anchor at the origin, which
is deterministic across calls and scans.  Points beyond +-81 m clamp into
border voxels (far outside the 30 m x 25 m arena).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_OFF = 4096          # voxel-index offset: supports coordinates in [-OFF, OFF) voxels
_STRIDE = 2 * _OFF   # row stride of the flattened voxel key
_SENTINEL = 2**30  # plain int: avoid import-time backend initialisation


def voxel_keys(xy: jnp.ndarray, valid: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """Flattened int32 voxel key per point; invalid points get a sentinel key."""
    ij = jnp.floor(xy / jnp.float32(voxel_size)).astype(jnp.int32)
    ij = jnp.clip(ij + _OFF, 0, _STRIDE - 1)
    key = ij[:, 0] * _STRIDE + ij[:, 1]
    return jnp.where(valid, key, _SENTINEL)


def voxel_downsample(xy: jnp.ndarray, valid: jnp.ndarray, voxel_size: float):
    """Segment-mean voxel downsample.

    Args:
      xy: ``(N, 2)`` float32 mm.
      valid: ``(N,)`` bool.
      voxel_size: voxel edge in mm.

    Returns:
      ``(out_xy, out_valid)`` of the same static shape: one averaged point per
      occupied voxel (packed at the front, since keys sort ascending and the
      sentinel sorts last), invalid slots zeroed.
    """
    n = xy.shape[0]
    key = voxel_keys(xy, valid, voxel_size)
    uniq, inv = jnp.unique(key, size=n, fill_value=_SENTINEL, return_inverse=True)
    w = valid.astype(jnp.float32)
    sums = jax.ops.segment_sum(xy * w[:, None], inv, num_segments=n)
    cnts = jax.ops.segment_sum(w, inv, num_segments=n)
    out_valid = (cnts > 0) & (uniq != _SENTINEL)
    out_xy = sums / jnp.maximum(cnts, 1.0)[:, None]
    out_xy = jnp.where(out_valid[:, None], out_xy, 0.0)
    return out_xy, out_valid


def compact(xy: jnp.ndarray, valid: jnp.ndarray, capacity: int):
    """Stable-pack valid points to the front and truncate/pad to ``capacity``.

    Used to fold a ``(map + scan)``-sized buffer back into the fixed-capacity
    global map after insertion (`mainn.py:330-331`'s ``points.extend`` becomes a
    bounded buffer).  Points beyond ``capacity`` are dropped oldest-last (stable
    order preserves insertion order).

    One multi-operand stable sort carries the payload columns through the
    permutation — argsort + two post-sort gathers cost ~0.3 ms per SLAM step
    at map capacity (random-access gathers serialize on TPU).
    """
    key = jnp.where(valid, 0, 1).astype(jnp.int32)
    _, xs, ys, vs = jax.lax.sort(
        (key, xy[:, 0], xy[:, 1], valid.astype(jnp.int32)), num_keys=1, is_stable=True
    )
    xy_sorted = jnp.stack([xs, ys], axis=1)
    valid_sorted = vs.astype(bool)
    n = xy.shape[0]
    if capacity <= n:
        return xy_sorted[:capacity], valid_sorted[:capacity]
    pad = capacity - n
    return (
        jnp.concatenate([xy_sorted, jnp.zeros((pad, 2), xy.dtype)], axis=0),
        jnp.concatenate([valid_sorted, jnp.zeros(pad, bool)], axis=0),
    )
