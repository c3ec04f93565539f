"""Instance-mask assembly and mask -> polygon conversion (segmentation task).

Gives our detector family the capability the reference gets from Ultralytics
seg models: binary instance masks (`auto_labels_segmentation.py:76-94` reads
``r.masks.data``, resizes, thresholds) and polygon extraction for the
labeling toolchain (`:263-302` mask -> findContours -> polygon rows).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def assemble_masks(protos: jnp.ndarray, coeffs: jnp.ndarray, boxes: jnp.ndarray, img_size: int):
    """Combine prototype masks with per-detection coefficients.

    Args:
      protos: ``(Hp, Wp, P)`` prototype bases (1/4 input resolution).
      coeffs: ``(K, P)`` per-detection coefficients.
      boxes: ``(K, 4)`` xyxy in input pixels (masks are cropped to their box,
        like Ultralytics).
      img_size: input resolution S.

    Returns ``(K, Hp, Wp)`` float32 mask probabilities (sigmoid), zeroed
    outside each detection's box.
    """
    hp, wp, _ = protos.shape
    m = jnp.einsum("hwp,kp->khw", protos.astype(jnp.float32), coeffs.astype(jnp.float32))
    m = jax.nn.sigmoid(m)
    scale = hp / img_size
    ys = jnp.arange(hp, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(wp, dtype=jnp.float32)[None, None, :]
    b = boxes * scale
    inside = (
        (xs >= b[:, 0, None, None]) & (xs < b[:, 2, None, None])
        & (ys >= b[:, 1, None, None]) & (ys < b[:, 3, None, None])
    )
    return m * inside


def mask_to_polygon(mask: np.ndarray, threshold: float = 0.5, max_points: int = 64) -> np.ndarray:
    """Binary mask -> single outer polygon ``(P, 2)`` in mask pixels.

    Marching-squares boundary walk (no OpenCV dependency in the core path);
    returns the largest connected boundary, subsampled to ``max_points``.
    """
    binary = np.asarray(mask) >= threshold
    if not binary.any():
        return np.zeros((0, 2))
    # pad so the boundary is closed
    padded = np.pad(binary, 1)
    # boundary cells: on-pixels with at least one off 4-neighbour
    up = np.roll(padded, 1, 0)
    down = np.roll(padded, -1, 0)
    left = np.roll(padded, 1, 1)
    right = np.roll(padded, -1, 1)
    boundary = padded & ~(up & down & left & right)
    ys, xs = np.nonzero(boundary)
    pts = np.stack([xs - 1, ys - 1], axis=1).astype(np.float64)

    # order boundary points by angle around the centroid (adequate for the
    # convex-ish blobs the labeler traces)
    c = pts.mean(axis=0)
    ang = np.arctan2(pts[:, 1] - c[1], pts[:, 0] - c[0])
    pts = pts[np.argsort(ang)]
    if len(pts) > max_points:
        idx = np.linspace(0, len(pts) - 1, max_points).astype(int)
        pts = pts[idx]
    return pts


def masks_to_label_rows(masks: np.ndarray, classes: np.ndarray, img_size: int, threshold: float = 0.5):
    """Masks -> normalised YOLO polygon label rows (auto-label output format,
    `labels_segmentation.py:61-76`)."""
    rows = []
    hp = masks.shape[1]
    for mask, cls in zip(masks, classes):
        poly = mask_to_polygon(mask, threshold)
        if len(poly) < 3:
            continue
        norm = poly / hp
        flat = " ".join(f"{v:.6f}" for xy in norm for v in xy)
        rows.append(f"{int(cls)} {flat}")
    return rows
