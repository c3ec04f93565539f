"""Masked brute-force nearest neighbour on TPU.

Replaces the reference's SciPy ``KDTree.query`` (`labels_segmentation/icp.py:38-40`)
and Open3D ``compute_point_cloud_distance`` (`process.py:75-84`) with an MXU
pairwise-distance matmul + masked argmin.  KD-trees are pointer-chasing and
hostile to XLA; at our sizes (512 x 16k) a dense distance matrix is faster than
tree traversal on any hardware with a systolic array.

Float32 hygiene: coordinates are millimetres (up to ~1.5e4), so the
``|a|^2 + |b|^2 - 2ab`` expansion would cancel catastrophically at ~1e9 scale.
We centre on the source centroid and rescale to metres before the matmul, which
keeps squared distances O(100) and the absolute error around 1e-5 m^2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.ops.geometry import masked_mean

_BIG = jnp.float32(1e30)


def pairwise_sqdist(src: jnp.ndarray, tgt: jnp.ndarray) -> jnp.ndarray:
    """``(N, M)`` squared distances in the units of the inputs (MXU matmul form)."""
    sn = jnp.sum(src * src, axis=-1)
    tn = jnp.sum(tgt * tgt, axis=-1)
    # full f32 on the MXU: the default bf16 matmul would cost ~mm-scale error
    cross = jnp.dot(
        src, tgt.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.maximum(sn[:, None] + tn[None, :] - 2.0 * cross, 0.0)


def nearest_neighbor(
    src_xy: jnp.ndarray,
    tgt_xy: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    src_valid: jnp.ndarray | None = None,
    use_pallas: bool | None = None,
):
    """Nearest valid target for every source point.

    On TPU (with lane-aligned shapes) this dispatches to the fused Pallas
    kernel, which never materialises the ``(N, M)`` distance matrix in HBM;
    elsewhere it falls back to the centred matmul + argmin XLA path.

    Args:
      src_xy: ``(N, 2)`` float32 mm.
      tgt_xy: ``(M, 2)`` float32 mm.
      tgt_valid: ``(M,)`` bool.
      src_valid: optional ``(N,)`` bool — invalid sources get distance ``inf``-like
        ``1e30`` (they never pass correspondence gates downstream).

    Returns:
      ``(dist_mm, idx)``: ``(N,)`` float32 distances (mm) and ``(N,)`` int32
      indices into the target array.
    """
    n, m = src_xy.shape[0], tgt_xy.shape[0]
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and n % 8 == 0 and m % 128 == 0
    if use_pallas:
        from icp_slam_yolo_tpu.ops.pallas.nn_kernel import nn_argmin_pallas

        d2min, idx = nn_argmin_pallas(src_xy, tgt_xy, tgt_valid)
        dist = jnp.sqrt(jnp.maximum(d2min, 0.0))
    else:
        center = masked_mean(src_xy, src_valid if src_valid is not None else jnp.ones(n, bool))
        s = (src_xy - center) * jnp.float32(1e-3)
        t = (tgt_xy - center) * jnp.float32(1e-3)
        d2 = pairwise_sqdist(s, t)
        d2 = jnp.where(tgt_valid[None, :], d2, _BIG)
        idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
        dist = jnp.sqrt(jnp.min(d2, axis=1)) * jnp.float32(1e3)
    if src_valid is not None:
        dist = jnp.where(src_valid, dist, _BIG)
    return dist, idx


def knn_mean_distance(xy: jnp.ndarray, valid: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mean distance (mm) to the (up to) ``k`` nearest *other* valid points.

    Backs the statistical outlier filter (Open3D
    ``remove_statistical_outlier`` semantics, `process.py:62-66`).  When fewer
    than ``k`` real neighbours exist the mean is over the available ones only
    (phantom-padded slots are excluded — mixing a 1e18 sentinel into an f32
    mean would absorb the real distances entirely).  Invalid points get ``1e30``.
    """
    center = masked_mean(xy, valid)
    p = (xy - center) * jnp.float32(1e-3)
    d2 = pairwise_sqdist(p, p)
    n = xy.shape[0]
    eye = jnp.eye(n, dtype=bool)
    d2 = jnp.where(eye | ~valid[None, :], _BIG, d2)
    # top-k smallest = -top_k(-d2)
    neg_topk, _ = jax.lax.top_k(-d2, min(k, n))
    d2k = -neg_topk
    real = d2k < jnp.float32(1e29)
    dk = jnp.sqrt(jnp.maximum(d2k, 0.0)) * jnp.float32(1e3)
    mean_k = jnp.sum(jnp.where(real, dk, 0.0), axis=1) / jnp.maximum(jnp.sum(real, axis=1), 1)
    return jnp.where(valid, mean_k, _BIG)
