"""Weighted rigid-transform solves (Kabsch).

The reference solves the per-iteration best-fit with centroid-subtraction +
SVD and a reflection fix (`labels_segmentation/icp.py:5-26`).  In 2-D the SVD
solve has an exact closed form — ``theta = atan2(sum(w * cross), sum(w * dot))``
on centred correspondences — which avoids a batched SVD inside the hot
``lax.scan`` loop entirely.  The 3-D SVD variant is kept for API parity and as
an oracle check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def best_fit_se2(src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray):
    """Weighted 2-D rigid alignment of ``src`` onto ``dst``.

    Exact minimiser of ``sum_i w_i |R p_i + t - q_i|^2``.

    Args:
      src: ``(N, 2)`` source points (mm).
      dst: ``(N, 2)`` corresponding targets (mm).
      weights: ``(N,)`` float or bool; zero total weight returns identity.

    Returns:
      ``(theta, t)``: rotation angle (rad) and ``(2,)`` translation (mm).
    """
    w = weights.astype(jnp.float32)
    wsum = jnp.sum(w)
    safe = jnp.maximum(wsum, 1e-9)
    ca = jnp.sum(src * w[:, None], axis=0) / safe
    cb = jnp.sum(dst * w[:, None], axis=0) / safe
    # metres for f32 precision of the moment sums
    a = (src - ca) * 1e-3
    b = (dst - cb) * 1e-3
    sxx = jnp.sum(w * (a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1]))
    sxy = jnp.sum(w * (a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]))
    theta = jnp.arctan2(sxy, sxx)
    degenerate = wsum < 1e-6
    theta = jnp.where(degenerate, 0.0, theta)
    c, s = jnp.cos(theta), jnp.sin(theta)
    r_ca = jnp.stack([c * ca[0] - s * ca[1], s * ca[0] + c * ca[1]])
    t = jnp.where(degenerate, jnp.zeros(2, jnp.float32), cb - r_ca)
    return theta, t


def best_fit_transform_svd(a: jnp.ndarray, b: jnp.ndarray, weights: jnp.ndarray | None = None):
    """General-dimension weighted Kabsch via SVD with reflection fix.

    Mirrors `labels_segmentation/icp.py:5-26` (``H = AA.T @ BB``; ``R = V U.T``;
    if ``det(R) < 0`` negate the last row of ``Vt``), extended with weights.

    Returns ``(R, t)`` with ``b ~= a @ R.T + t``.
    """
    n, d = a.shape
    w = jnp.ones(n, jnp.float32) if weights is None else weights.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    ca = jnp.sum(a * w[:, None], axis=0) / wsum
    cb = jnp.sum(b * w[:, None], axis=0) / wsum
    aa = (a - ca) * w[:, None]
    bb = b - cb
    h = jnp.matmul(aa.T, bb, precision=jax.lax.Precision.HIGHEST)
    u, _, vt = jnp.linalg.svd(h)
    r = vt.T @ u.T
    det = jnp.linalg.det(r)
    fix = jnp.ones(d).at[-1].set(jnp.sign(det))
    r = (vt.T * fix[None, :]) @ u.T
    t = cb - r @ ca
    return r, t
