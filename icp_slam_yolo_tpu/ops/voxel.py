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
# invalid-point key: sorts after every real key (real keys < _STRIDE^2 = 2^26)
# while leaving headroom to pack a segment-end flag bit above it (see
# voxel_downsample's second sort)
_SENTINEL = 2**26  # plain int: avoid import-time backend initialisation


def voxel_keys(xy: jnp.ndarray, valid: jnp.ndarray, voxel_size) -> jnp.ndarray:
    """Flattened int32 voxel key per point; invalid points get a sentinel key.
    ``voxel_size`` may be a traced scalar (the batched downsample vmaps over
    per-row sizes)."""
    ij = jnp.floor(xy / jnp.asarray(voxel_size, jnp.float32)).astype(jnp.int32)
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

    Implementation: two multi-operand stable sorts + prefix sums — no
    `unique`, no `segment_sum` (whose scatter-adds serialize on TPU and showed
    up hot in the SLAM-step profile at map capacity).  After sorting by voxel
    key, each segment's sum is the difference of inclusive prefix sums at
    consecutive segment ends; a second stable sort on the is-segment-end flag
    packs those ends to the front in key order.  Coordinate prefix sums use a
    split accumulator (multiples of 32 mm accumulate exactly in f32 up to the
    buffer sizes used here; the < 16 mm residual carries the rounding error,
    which stays ~1e-3 mm on real data — same order as the scatter-add path).
    """
    n = xy.shape[0]
    key = voxel_keys(xy, valid, voxel_size)
    w = valid.astype(jnp.float32)
    xw = xy[:, 0] * w
    yw = xy[:, 1] * w
    # the 0/1 weight needs no sort lane of its own: a sorted slot is valid
    # exactly when its key is not the sentinel
    k, xs, ys = jax.lax.sort((key, xw, yw), num_keys=1, is_stable=True)
    ws = (k != _SENTINEL).astype(jnp.float32)

    # split prefix sums: hi = nearest multiple of 32 mm (exact f32 integer
    # arithmetic for |prefix| < 2^24 * 32 mm), lo = residual in [-16, 16).
    # All five prefix sums run as ONE cumsum over a 5-column array — per
    # column the math is identical, but five separate (N,) cumsums lower to
    # five dispatch-bound reduce-windows (~5.7 us each at N=512; three
    # downsamples per realtime SLAM step made this ~80 us of pure dispatch).
    def split(v):
        hi = jnp.round(v * (1.0 / 32.0)) * 32.0
        return hi, v - hi

    xh, xl = split(xs)
    yh, yl = split(ys)
    c = jnp.cumsum(jnp.stack([xh, xl, yh, yl, ws], axis=-1), axis=0)
    cxh, cxl, cyh, cyl, cw = (c[:, i] for i in range(5))
    last = jnp.concatenate([k[:-1] != k[1:], jnp.ones(1, bool)])
    # pack (segment-end flag, key) into ONE sort key: keys use 27 bits
    # (sentinel included), the not-an-end flag rides bit 27.  Sorting by the
    # packed key == sorting by (flag, key), and within the flag=0 group the
    # rows were already in key order, so the stable result is identical while
    # the sort carries one less operand.
    pkey = jnp.where(last, 0, _SENTINEL * 2) + k
    pk, pxh, pxl, pyh, pyl, pw = jax.lax.sort(
        (pkey, cxh, cxl, cyh, cyl, cw), num_keys=1, is_stable=True
    )

    def seg(c):
        return c - jnp.concatenate([jnp.zeros(1, c.dtype), c[:-1]])

    sx = seg(pxh) + seg(pxl)
    sy = seg(pyh) + seg(pyl)
    sw = seg(pw)
    out_valid = (pk < _SENTINEL) & (sw > 0)
    out_xy = jnp.stack([sx, sy], axis=1) / jnp.maximum(sw, 1.0)[:, None]
    out_xy = jnp.where(out_valid[:, None], out_xy, 0.0)
    return out_xy, out_valid


def voxel_downsample_batched(xys: jnp.ndarray, valids: jnp.ndarray, voxel_sizes):
    """Segment-mean downsample of ``B`` same-length clouds at per-row voxel
    sizes in ONE call: ``(B, N, 2), (B, N), (B,) -> ((B, N, 2), (B, N))``.

    `jax.lax.sort` and `cumsum` batch natively, so vmapping the single-cloud
    implementation turns the 2B small sorts + B cumsums of separate calls into
    2 batched sorts + 1 batched cumsum — the realtime SLAM step runs two
    back-to-back scan-sized downsamples (duplicate filter at 30 mm +
    occupancy dedup at 2x grid resolution, `mainn.py:320,338`) whose separate
    dispatches were pure overhead at N=512.
    """
    sizes = jnp.asarray(voxel_sizes, jnp.float32)
    return jax.vmap(voxel_downsample)(xys, valids, sizes)


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
    ks, xs, ys = jax.lax.sort((key, xy[:, 0], xy[:, 1]), num_keys=1, is_stable=True)
    xy_sorted = jnp.stack([xs, ys], axis=1)
    valid_sorted = ks == 0  # validity is the sort key itself: no extra operand
    n = xy.shape[0]
    if capacity <= n:
        return xy_sorted[:capacity], valid_sorted[:capacity]
    pad = capacity - n
    return (
        jnp.concatenate([xy_sorted, jnp.zeros((pad, 2), xy.dtype)], axis=0),
        jnp.concatenate([valid_sorted, jnp.zeros(pad, bool)], axis=0),
    )
