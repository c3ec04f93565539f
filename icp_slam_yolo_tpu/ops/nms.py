"""TPU-side non-maximum suppression with static shapes.

Ultralytics runs NMS on the host after the PyTorch forward; here detection is
one compiled program, so NMS is in-graph: top-K pre-selection, a masked IoU
matrix, and a parallel fixpoint suppression sweep (SURVEY.md section 7:
"padded boxes, masked IoU matrix, fixed-iteration suppression").

The greedy sweep is NOT run as a K-step sequential scan: with candidates
score-sorted, greedy keep/suppress is the unique fixpoint of the
lower-triangular relation ``keep_i = valid_i AND no kept j < i suppresses
i`` (induction on i: keep_0 is forced, then each keep_i is forced by the
earlier rows), and iterating that whole-vector equation from ``keep = valid``
stabilises every index whose suppression-dependency chain is <= t after t
iterations — so a `lax.while_loop` to fixpoint computes EXACT greedy NMS in
(longest chain) iterations, typically 1-2 for detection workloads, instead
of K sequential scan steps (K=100 tiny kernels dominated detect's decode+NMS
tail in the latency regime).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Detections(NamedTuple):
    boxes: jnp.ndarray   # (K, 4) xyxy pixels
    scores: jnp.ndarray  # (K,)
    classes: jnp.ndarray # (K,) int32
    valid: jnp.ndarray   # (K,) bool
    anchor_idx: jnp.ndarray  # (K,) int32 index into the flat anchor axis —
    # lets callers gather per-anchor extras (OBB angles, mask coefficients)
    # for exactly the kept boxes; -1 where invalid


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: ``(N, 4) x (M, 4) -> (N, M)``."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    conf_threshold: float = 0.5,
    iou_threshold: float = 0.45,
    max_detections: int = 100,
) -> Detections:
    """Greedy class-aware NMS over flat per-anchor candidates.

    Args:
      boxes: ``(A, 4)`` xyxy.
      scores: ``(A,)`` best-class confidence.
      classes: ``(A,)`` int32 best class.

    Returns top ``max_detections`` survivors, score-sorted, with a valid mask.
    The default thresholds mirror the reference (`mainn.py:175`: conf=0.5).
    """
    k = min(max_detections, boxes.shape[0])
    conf_ok = scores >= conf_threshold
    cand_scores = jnp.where(conf_ok, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(cand_scores, k)
    top_boxes = boxes[top_idx]
    top_classes = classes[top_idx]
    cand_valid = top_scores > 0
    return suppress(top_boxes, top_scores, top_classes,
                    top_idx.astype(jnp.int32), cand_valid, iou_threshold)


def suppress(
    top_boxes: jnp.ndarray,
    top_scores: jnp.ndarray,
    top_classes: jnp.ndarray,
    top_idx: jnp.ndarray,
    cand_valid: jnp.ndarray,
    iou_threshold: float = 0.45,
) -> Detections:
    """Greedy suppression over score-DESCENDING candidates (module docstring:
    exact greedy keep as the fixpoint of the triangular relation, reached by
    a while_loop in longest-suppression-chain iterations).

    Inputs are the ``(K, ...)`` pre-selected candidates (row 0 = best score);
    invalid rows must have ``cand_valid`` False.  Used directly by the
    detector's decode-top-K-first fast path, and by `nms` above.
    """
    k = top_scores.shape[0]
    iou = box_iou(top_boxes, top_boxes)
    same_class = top_classes[:, None] == top_classes[None, :]
    order = jnp.arange(k)
    # sup[j, i]: an earlier (higher-score) kept j removes i
    sup = (iou > iou_threshold) & same_class & (order[:, None] < order[None, :])

    def cond(carry):
        keep, prev, it = carry
        return (it < k) & jnp.any(keep != prev)

    def body(carry):
        keep, _, it = carry
        suppressed = jnp.any(keep[:, None] & sup, axis=0)
        return cand_valid & ~suppressed, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (cand_valid, jnp.zeros(k, bool), jnp.int32(0))
    )
    return Detections(
        boxes=jnp.where(keep[:, None], top_boxes, 0.0),
        scores=jnp.where(keep, top_scores, 0.0),
        classes=jnp.where(keep, top_classes, -1),
        valid=keep,
        anchor_idx=jnp.where(keep, top_idx, -1),
    )


def best_class(scores_ac: jnp.ndarray):
    """Per-anchor best class + confidence from ``(A, C)`` class scores."""
    cls = jnp.argmax(scores_ac, axis=-1).astype(jnp.int32)
    conf = jnp.max(scores_ac, axis=-1)
    return conf, cls
