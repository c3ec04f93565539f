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

_BIG = 1e30  # plain float: a module-level jnp scalar would initialise the
# backend at import time and break jax.distributed.initialize for multi-host


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


def knn_indices(xy: jnp.ndarray, valid: jnp.ndarray, k: int, row_tile: int = 1024):
    """Indices of the (up to) ``k`` nearest *other* valid points for every point.

    Row-chunked so the ``(M, M)`` distance matrix never materialises beyond a
    ``(row_tile, M)`` slab — the map buffer is 24k points and a full matrix
    would be 2.4 GB.  Returns ``(idx, ok)``: ``(M, k) int32`` neighbour indices
    and a same-shape bool marking real (valid, non-self) neighbours.
    """
    m = xy.shape[0]
    k = min(k, m)
    center = masked_mean(xy, valid)
    p = (xy - center) * jnp.float32(1e-3)
    t = min(row_tile, m)
    mp = -(-m // t) * t
    rows = jnp.zeros((mp, 2), p.dtype).at[:m].set(p).reshape(mp // t, t, 2)
    row_ids = jnp.arange(mp, dtype=jnp.int32).reshape(mp // t, t)
    col_ids = jnp.arange(m, dtype=jnp.int32)

    def tile_fn(_, inp):
        tile, ids = inp
        d2 = pairwise_sqdist(tile, p)
        d2 = jnp.where((ids[:, None] == col_ids[None, :]) | ~valid[None, :], _BIG, d2)
        neg, idx = _smallest_k(d2, k)
        return None, (idx.astype(jnp.int32), -neg < jnp.float32(1e29))

    _, (idx, ok) = jax.lax.scan(tile_fn, None, (rows, row_ids))
    return idx.reshape(mp, k)[:m], ok.reshape(mp, k)[:m]


def _regularized_cov(pts: jnp.ndarray, w: jnp.ndarray, epsilon: float, extra_degenerate=None):
    """Neighbourhoods ``(N, K, 2)`` with weights ``(N, K)`` -> Segal-regularised
    ``(N, 2, 2)`` covariances: eigenvalues replaced by ``(1, epsilon)`` so only
    the principal (wall-tangent) direction survives:
    ``C = eps*I + (1-eps) * u u^T``.  Degenerate neighbourhoods (fewer than 3
    real members, or isotropic) get the identity.
    """
    n = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    mu = jnp.sum(pts * w[..., None], axis=1, keepdims=True) / n[..., None]
    d = (pts - mu) * jnp.float32(1e-3) * w[..., None]
    a = jnp.sum(d[:, :, 0] * d[:, :, 0], axis=1)
    b = jnp.sum(d[:, :, 0] * d[:, :, 1], axis=1)
    c = jnp.sum(d[:, :, 1] * d[:, :, 1], axis=1)
    disc = jnp.sqrt(jnp.maximum(((a - c) * 0.5) ** 2 + b * b, 0.0))
    e1 = (a + c) * 0.5 + disc
    # principal eigenvector: the better-conditioned of the two analytic forms
    v1 = jnp.stack([b, e1 - a], axis=-1)
    v2 = jnp.stack([e1 - c, b], axis=-1)
    n1 = jnp.sum(v1 * v1, axis=-1)
    n2 = jnp.sum(v2 * v2, axis=-1)
    v = jnp.where((n1 > n2)[:, None], v1, v2)
    vn = jnp.maximum(jnp.sqrt(jnp.maximum(n1, n2)), 1e-20)
    u = v / vn[:, None]
    # planarity gating: full plane weighting only where the neighbourhood is
    # strongly linear (a wall); corners/clutter keep isotropic anchoring.
    # Ungated anisotropy lets the pose random-walk along corridor tangents —
    # full-1800 acceptance collapsed 99.3% -> 59% without this.
    e2 = (a + c) * 0.5 - disc
    lin = (e1 - e2) / jnp.maximum(e1, 1e-20)  # 1 = perfect line, 0 = isotropic
    eps = jnp.float32(epsilon)
    eps_eff = (eps + (1.0 - lin * lin) * (1.0 - eps))[:, None, None]
    cov = eps_eff * jnp.eye(2, dtype=jnp.float32)[None] + (1.0 - eps_eff) * (
        u[:, :, None] * u[:, None, :]
    )
    degenerate = (jnp.sum(w, axis=1) < 3.0) | (disc < 1e-14)
    if extra_degenerate is not None:
        degenerate = degenerate | extra_degenerate
    return jnp.where(degenerate[:, None, None], jnp.eye(2, dtype=jnp.float32)[None], cov)


def local_covariances(
    xy: jnp.ndarray, valid: jnp.ndarray, k: int = 20, epsilon: float = 1e-3, row_tile: int = 1024
) -> jnp.ndarray:
    """GICP-regularised local covariance per point: ``(M, 2, 2)``.

    The 2-D analogue of Open3D's ``estimate_covariances``
    (`gicp_lidar.py:23-35` uses max_nn=20) with the Segal plane-to-plane
    regularisation — see `_regularized_cov`.
    """
    idx, ok = knn_indices(xy, valid, k, row_tile)
    pts = jnp.concatenate([xy[:, None, :], xy[idx]], axis=1)  # self + neighbours
    w = jnp.concatenate([valid[:, None], ok], axis=1).astype(jnp.float32)
    return _regularized_cov(pts, w, epsilon, extra_degenerate=~valid)


def local_covariances_at(
    queries: jnp.ndarray,
    cloud: jnp.ndarray,
    cloud_valid: jnp.ndarray,
    k: int = 20,
    epsilon: float = 1e-3,
) -> jnp.ndarray:
    """Segal-regularised covariance of each query's k-NN neighbourhood in
    ``cloud``: ``(N, 2, 2)``.

    Unlike `local_covariances` this only sweeps the rows actually needed —
    one ``(N, M)`` distance slab, the same cost class as the correspondence
    search itself — so GICP can evaluate covariances at the *matched* targets
    per iteration instead of precomputing all M map slots (a 24k-slot map
    made the precompute ~50x the cost of the solve).  A query that is itself
    a cloud point simply finds itself as its own nearest neighbour (Open3D's
    neighbourhoods include the query too).
    """
    center = masked_mean(cloud, cloud_valid)
    q = (queries - center) * jnp.float32(1e-3)
    p = (cloud - center) * jnp.float32(1e-3)
    d2 = jnp.where(cloud_valid[None, :], pairwise_sqdist(q, p), _BIG)
    neg, idx = _smallest_k(d2, min(k, cloud.shape[0]))
    w = (-neg < jnp.float32(1e29)).astype(jnp.float32)
    return _regularized_cov(cloud[idx], w, epsilon)


def _smallest_k(d2: jnp.ndarray, k: int):
    """``(values_neg, idx)`` of the k smallest entries per row.

    On TPU, ``lax.top_k`` lowers to a full per-row sort; ``approx_max_k`` is
    the hardware-native O(M) reduction (aggregate_to_topk=True gives exact
    ordering of the returned k).  Covariance neighbourhoods only need *a*
    set of near points, so the ~0.95 recall is immaterial.
    """
    if jax.default_backend() == "tpu":
        return jax.lax.approx_max_k(-d2, k)
    return jax.lax.top_k(-d2, k)


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
    # smallest-k via `_smallest_k`: on TPU that is `approx_max_k`, the
    # hardware-native O(M) reduction — `lax.top_k` lowers to a full per-row
    # sort, which profiled as the single biggest XLA op of the realtime fleet
    # step (~320 us/step at B=8).  The filter thresholds a *mean* of k
    # distances against a cloud-adaptive mu + 1.5 sigma, so the ~0.95 recall
    # of the approximate reduction is immaterial (full-replay acceptance is
    # gate-checked in scripts/quality_check.py).
    neg_topk, _ = _smallest_k(d2, min(k, n))
    d2k = -neg_topk
    real = d2k < jnp.float32(1e29)
    dk = jnp.sqrt(jnp.maximum(d2k, 0.0)) * jnp.float32(1e3)
    mean_k = jnp.sum(jnp.where(real, dk, 0.0), axis=1) / jnp.maximum(jnp.sum(real, axis=1), 1)
    return jnp.where(valid, mean_k, _BIG)
