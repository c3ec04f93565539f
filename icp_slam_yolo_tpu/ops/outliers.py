"""Point-cloud hygiene filters: statistical outliers and dynamic points.

Masked TPU equivalents of the reference's Open3D wrappers:
``remove_statistical_outlier`` (`process.py:62-66`) and the
dynamic-point rejection via ``compute_point_cloud_distance``
(`process.py:75-84`).
"""

from __future__ import annotations

import jax.numpy as jnp

from icp_slam_yolo_tpu.ops.nn import knn_mean_distance, nearest_neighbor


def statistical_outlier_mask(
    xy: jnp.ndarray, valid: jnp.ndarray, nb_neighbors: int = 30, std_ratio: float = 1.5
) -> jnp.ndarray:
    """Keep-mask per Open3D semantics: drop points whose mean k-NN distance
    exceeds ``mean + std_ratio * std`` of that statistic over the cloud.

    Reference params: ``OUTLIER_NB_NEIGHBORS=30, OUTLIER_STD_RATIO=1.5``
    (`Config.py:13-14`).
    """
    mean_knn = knn_mean_distance(xy, valid, nb_neighbors)
    w = valid.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    vals = jnp.where(valid, mean_knn, 0.0)
    mu = vals.sum() / denom
    var = (w * (vals - mu) ** 2).sum() / denom
    thresh = mu + std_ratio * jnp.sqrt(var)
    return valid & (mean_knn <= thresh)


def dynamic_points_mask(
    cur_xy: jnp.ndarray,
    cur_valid: jnp.ndarray,
    prev_xy: jnp.ndarray,
    prev_valid: jnp.ndarray,
    distance_threshold_mm: float,
) -> jnp.ndarray:
    """Keep-mask for static points: NN distance to the previous scan's (global)
    cloud below threshold (`process.py:75-84`; offline threshold 250 mm,
    realtime 300 mm).  If the previous cloud is empty, keep everything
    (`process.py:77`).
    """
    dist, _ = nearest_neighbor(cur_xy, prev_xy, prev_valid, cur_valid)
    keep = cur_valid & (dist < distance_threshold_mm)
    no_prev = ~jnp.any(prev_valid)
    return jnp.where(no_prev, cur_valid, keep)
