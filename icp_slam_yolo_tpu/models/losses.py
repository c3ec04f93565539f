"""Detection loss: task-aligned assignment + BCE / CIoU / DFL.

Re-implements the v8 detection loss family the reference trains with
(Ultralytics configs `train2/args.yaml`: box=7.5, cls=0.5, dfl=1.5): the
task-aligned assigner (top-k candidates by ``score^alpha * iou^beta`` among
anchors whose centre lies inside the gt box), BCE classification against the
normalised alignment metric, CIoU box loss and distribution-focal loss on the
ltrb bin distributions.  Fully masked/static: ground truths are padded to a
fixed ``max_gt`` per image.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.models.yolo import dfl_decode, make_anchors


class LossWeights(NamedTuple):
    box: float = 7.5   # `train2/args.yaml` box
    cls: float = 0.5   # `train2/args.yaml` cls
    dfl: float = 1.5   # `train2/args.yaml` dfl


def ciou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Complete IoU between aligned xyxy box arrays ``(..., 4)``."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.maximum(a[..., 2] - a[..., 0], 0) * jnp.maximum(a[..., 3] - a[..., 1], 0)
    area_b = jnp.maximum(b[..., 2] - b[..., 0], 0) * jnp.maximum(b[..., 3] - b[..., 1], 0)
    union = area_a + area_b - inter
    iou = inter / (union + eps)

    # enclosing box diagonal + centre distance
    elt = jnp.minimum(a[..., :2], b[..., :2])
    erb = jnp.maximum(a[..., 2:], b[..., 2:])
    ewh = erb - elt
    c2 = ewh[..., 0] ** 2 + ewh[..., 1] ** 2 + eps
    ca = (a[..., :2] + a[..., 2:]) / 2
    cb = (b[..., :2] + b[..., 2:]) / 2
    rho2 = jnp.sum((ca - cb) ** 2, axis=-1)

    wa = jnp.maximum(a[..., 2] - a[..., 0], eps)
    ha = jnp.maximum(a[..., 3] - a[..., 1], eps)
    wb = jnp.maximum(b[..., 2] - b[..., 0], eps)
    hb = jnp.maximum(b[..., 3] - b[..., 1], eps)
    v = (4 / math.pi**2) * (jnp.arctan(wb / hb) - jnp.arctan(wa / ha)) ** 2
    alpha = v / (v - iou + 1 + eps)
    return iou - rho2 / c2 - jax.lax.stop_gradient(alpha) * v


def task_aligned_assign(
    pred_scores: jnp.ndarray,  # (A, C) sigmoid probabilities
    pred_boxes: jnp.ndarray,   # (A, 4) xyxy decoded
    anchors: jnp.ndarray,      # (A, 2) centres
    gt_boxes: jnp.ndarray,     # (M, 4) xyxy
    gt_classes: jnp.ndarray,   # (M,) int32
    gt_valid: jnp.ndarray,     # (M,) bool
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
):
    """Returns ``(assigned_gt (A,), fg_mask (A,), target_scores (A, C))``."""
    a = anchors.shape[0]
    m = gt_boxes.shape[0]

    inside = (
        (anchors[None, :, 0] > gt_boxes[:, None, 0])
        & (anchors[None, :, 0] < gt_boxes[:, None, 2])
        & (anchors[None, :, 1] > gt_boxes[:, None, 1])
        & (anchors[None, :, 1] < gt_boxes[:, None, 3])
    ) & gt_valid[:, None]  # (M, A)

    cls_score = pred_scores[:, gt_classes].T  # (M, A)
    overlap = jax.vmap(lambda g: ciou(jnp.broadcast_to(g, pred_boxes.shape), pred_boxes))(gt_boxes)
    overlap = jnp.clip(overlap, 0.0, 1.0)  # (M, A)
    metric = (cls_score**alpha) * (overlap**beta)
    metric = jnp.where(inside, metric, 0.0)

    # top-k candidates per gt
    k = min(topk, a)
    thresh = jax.lax.top_k(metric, k)[0][:, -1:]  # (M, 1) k-th best
    candidate = inside & (metric >= jnp.maximum(thresh, 1e-9)) & (metric > 0)

    # conflict resolution: anchor goes to the gt with the highest metric
    masked_metric = jnp.where(candidate, metric, -1.0)
    assigned_gt = jnp.argmax(masked_metric, axis=0).astype(jnp.int32)  # (A,)
    fg_mask = jnp.max(masked_metric, axis=0) > 0

    # normalised target score (Ultralytics: metric scaled so max -> max overlap)
    pos_metric = jnp.max(jnp.where(candidate, metric, 0.0), axis=1, keepdims=True)  # (M, 1)
    pos_overlap = jnp.max(jnp.where(candidate, overlap, 0.0), axis=1, keepdims=True)
    norm_metric = metric * pos_overlap / jnp.maximum(pos_metric, 1e-9)  # (M, A)
    score_per_anchor = norm_metric[assigned_gt, jnp.arange(a)]
    target_scores = (
        jax.nn.one_hot(gt_classes[assigned_gt], pred_scores.shape[1])
        * jnp.where(fg_mask, score_per_anchor, 0.0)[:, None]
    )
    return assigned_gt, fg_mask, target_scores


def detection_loss(
    outs,
    gt_boxes: jnp.ndarray,    # (B, M, 4) xyxy pixels
    gt_classes: jnp.ndarray,  # (B, M)
    gt_valid: jnp.ndarray,    # (B, M)
    img_size: int,
    num_classes: int,
    reg_max: int = 16,
    weights: LossWeights = LossWeights(),
    gt_angles: jnp.ndarray | None = None,  # (B, M) rad — OBB task
    angle_weight: float = 1.0,
    return_aux: bool = False,
):
    """Total loss (scalar) + metric dict for a batch of head outputs.

    For the OBB task pass ``gt_angles``: the head's angle branch (decoded to
    (-pi/4, 3pi/4) like inference) gets a smooth-L1 term on foreground anchors
    against the assigned gt angle, on top of the axis-aligned box losses
    applied to the enclosing boxes.
    """
    anchors, strides = make_anchors(img_size)

    box_l = jnp.concatenate(
        [o[0].reshape(o[0].shape[0], -1, 4 * reg_max) for o in outs], axis=1
    ).astype(jnp.float32)  # (B, A, 64)
    cls_l = jnp.concatenate(
        [o[1].reshape(o[1].shape[0], -1, num_classes) for o in outs], axis=1
    ).astype(jnp.float32)  # (B, A, C)

    ltrb = dfl_decode(box_l, reg_max)  # (B, A, 4) in stride units
    xy1 = anchors[None] - ltrb[..., :2] * strides[None, :, None]
    xy2 = anchors[None] + ltrb[..., 2:] * strides[None, :, None]
    pred_boxes = jnp.concatenate([xy1, xy2], axis=-1)
    pred_scores = jax.nn.sigmoid(cls_l)

    # the assigner's outputs are TARGETS, not functions to differentiate:
    # without stop_gradient, d/dx sqrt(cls_score) is infinite once background
    # logits saturate (sigmoid -> exactly 0 in f32) and training NaNs (~step 500)
    assigned_gt, fg, tgt_scores = jax.lax.stop_gradient(
        jax.vmap(
            lambda s, b, gb, gc, gv: task_aligned_assign(s, b, anchors, gb, gc, gv)
        )(pred_scores, pred_boxes, gt_boxes, gt_classes, gt_valid)
    )

    # representability gate: an anchor whose assigned box needs an ltrb
    # distance beyond reg_max-1 bins CANNOT express it (the DFL ceiling at
    # stride 8 is 120 px — wide pallets saturate, and the saturated-but-
    # confident stride-8 anchors then win NMS with systematically clipped
    # boxes, capping val IoU at ~0.87).  Drop those anchors from fg entirely
    # so representable coarser-stride anchors carry the object.
    tgt_boxes = jnp.take_along_axis(gt_boxes, assigned_gt[..., None], axis=1)  # (B, A, 4)
    raw_ltrb = jnp.concatenate(
        [
            (anchors[None] - tgt_boxes[..., :2]) / strides[None, :, None],
            (tgt_boxes[..., 2:] - anchors[None]) / strides[None, :, None],
        ],
        axis=-1,
    )
    representable = jnp.all(raw_ltrb < reg_max - 1.01, axis=-1)
    fg = fg & representable
    tgt_scores = tgt_scores * fg[..., None]

    norm = jnp.maximum(jnp.sum(tgt_scores), 1.0)

    # classification: BCE against soft target scores over ALL anchors
    bce = -(tgt_scores * jax.nn.log_sigmoid(cls_l) + (1 - tgt_scores) * jax.nn.log_sigmoid(-cls_l))
    loss_cls = jnp.sum(bce) / norm

    # box: CIoU on foreground anchors, weighted by target score
    w_fg = jnp.sum(tgt_scores, axis=-1) * fg  # (B, A)
    iou_term = 1.0 - ciou(pred_boxes, tgt_boxes)
    loss_box = jnp.sum(iou_term * w_fg) / norm

    # DFL: cross-entropy between the two integer bins bracketing the target ltrb
    tgt_ltrb = jnp.clip(raw_ltrb, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(tgt_ltrb)
    wr = tgt_ltrb - tl
    logits = box_l.reshape(*box_l.shape[:-1], 4, reg_max)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tl_i = tl.astype(jnp.int32)
    lp_l = jnp.take_along_axis(logp, tl_i[..., None], axis=-1)[..., 0]
    lp_r = jnp.take_along_axis(logp, jnp.minimum(tl_i + 1, reg_max - 1)[..., None], axis=-1)[..., 0]
    dfl = -(lp_l * (1 - wr) + lp_r * wr)  # (B, A, 4)
    loss_dfl = jnp.sum(jnp.mean(dfl, axis=-1) * w_fg) / norm

    total = weights.box * loss_box + weights.cls * loss_cls + weights.dfl * loss_dfl
    metrics = {
        "loss_box": loss_box,
        "loss_cls": loss_cls,
        "loss_dfl": loss_dfl,
        "num_fg": jnp.sum(fg),
    }

    if gt_angles is not None and len(outs[0]) == 3:
        ang_l = jnp.concatenate(
            [o[2].reshape(o[2].shape[0], -1) for o in outs], axis=1
        ).astype(jnp.float32)  # (B, A)
        pred_ang = (jax.nn.sigmoid(ang_l) - 0.25) * math.pi  # inference decode
        tgt_ang = jnp.take_along_axis(gt_angles, assigned_gt, axis=1)
        # a rectangle's orientation is pi-periodic: wrap the error into
        # (-pi/2, pi/2] so equivalent orientations near the (-pi/4, 3pi/4)
        # decode boundary aren't penalised as ~pi errors
        raw = pred_ang - tgt_ang
        diff = jnp.arctan2(jnp.sin(2.0 * raw), jnp.cos(2.0 * raw)) * 0.5
        huber = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff, jnp.abs(diff) - 0.5)
        loss_ang = jnp.sum(huber * w_fg) / norm
        total = total + angle_weight * loss_ang
        metrics["loss_angle"] = loss_ang

    metrics["loss"] = total
    if return_aux:
        return total, metrics, {"assigned_gt": assigned_gt, "fg": fg, "w_fg": w_fg, "norm": norm}
    return total, metrics


def segmentation_loss(
    outs,
    protos: jnp.ndarray,      # (B, Hp, Wp, P)
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    gt_masks: jnp.ndarray,    # (B, M, Hp, Wp) float instance masks at proto res
    img_size: int,
    num_classes: int,
    reg_max: int = 16,
    weights: LossWeights = LossWeights(),
    max_fg: int = 64,
    mask_weight: float = 2.0,
):
    """Detection loss + per-instance mask loss (v8-seg style).

    Masks: for the top ``max_fg`` foreground anchors (by assignment weight),
    predict ``sigmoid(protos @ coeffs)``, crop to the assigned gt box, and take
    BCE against the gt instance mask — normalised per-instance by box area
    (Ultralytics' area normalisation), fixed-shape via top-k selection.
    """
    det_total, metrics, aux = detection_loss(
        outs, gt_boxes, gt_classes, gt_valid, img_size, num_classes, reg_max,
        weights, return_aux=True,
    )
    coef_l = jnp.concatenate(
        [o[2].reshape(o[2].shape[0], -1, o[2].shape[-1]) for o in outs], axis=1
    ).astype(jnp.float32)  # (B, A, P)

    b, hp, wp, p = protos.shape
    scale = hp / img_size

    def per_image(coefs, proto, assigned, w_fg, g_boxes, g_masks):
        w_top, idx = jax.lax.top_k(w_fg, max_fg)            # (K,)
        sel_gt = assigned[idx]                               # (K,)
        c = coefs[idx]                                       # (K, P)
        logits = jnp.einsum("hwp,kp->khw", proto, c)         # (K, Hp, Wp)
        tgt = g_masks[sel_gt]                                # (K, Hp, Wp)
        box = g_boxes[sel_gt] * scale                        # (K, 4) proto px
        ys = jnp.arange(hp, dtype=jnp.float32)[None, :, None]
        xs = jnp.arange(wp, dtype=jnp.float32)[None, None, :]
        inside = (
            (xs >= box[:, 0, None, None]) & (xs < box[:, 2, None, None])
            & (ys >= box[:, 1, None, None]) & (ys < box[:, 3, None, None])
        ).astype(jnp.float32)
        bce = optax_sigmoid_bce(logits, tgt) * inside        # (K, Hp, Wp)
        area = jnp.maximum((box[:, 2] - box[:, 0]) * (box[:, 3] - box[:, 1]), 1.0)
        per_inst = jnp.sum(bce, axis=(1, 2)) / area          # (K,)
        w = (w_top > 0).astype(jnp.float32)
        return jnp.sum(per_inst * w) / jnp.maximum(jnp.sum(w), 1.0)

    loss_mask = jnp.mean(
        jax.vmap(per_image)(coef_l, protos.astype(jnp.float32), aux["assigned_gt"], aux["w_fg"], gt_boxes, gt_masks)
    )
    total = det_total + mask_weight * loss_mask
    metrics = dict(metrics, loss_mask=loss_mask, loss=total)
    return total, metrics


def optax_sigmoid_bce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def pose_loss(
    outs,
    gt_boxes: jnp.ndarray,    # (B, M, 4) xyxy pixels
    gt_classes: jnp.ndarray,  # (B, M)
    gt_valid: jnp.ndarray,    # (B, M)
    gt_kpts: jnp.ndarray,     # (B, M, K, 3) [x_px, y_px, vis(0/1)]
    img_size: int,
    num_classes: int,
    reg_max: int = 16,
    weights: LossWeights = LossWeights(),
    kpt_weight: float = 12.0,   # Ultralytics `pose` gain default
    kobj_weight: float = 1.0,   # Ultralytics `kobj` gain default
):
    """Detection loss + OKS keypoint-location loss + visibility BCE (v8-pose
    style).  Ground truth is the reference labeler's pose format — bbox plus
    K ordered corner keypoints with visibility flags
    (`labels_segmentation.py:107-112`).

    Location term per foreground anchor: ``1 - exp(-d2 / (2 * area * (2s)^2))``
    with uniform per-keypoint sigma ``s = 1/K`` and ``area`` the assigned gt
    box area — the OKS kernel, averaged over visible keypoints, weighted by
    the assignment score like the box terms.
    """
    det_total, metrics, aux = detection_loss(
        outs, gt_boxes, gt_classes, gt_valid, img_size, num_classes, reg_max,
        weights, return_aux=True,
    )
    from icp_slam_yolo_tpu.models.yolo import decode_keypoints, make_anchors

    anchors, strides = make_anchors(img_size)
    kpt_l = jnp.concatenate(
        [o[2].reshape(o[2].shape[0], -1, o[2].shape[-1]) for o in outs], axis=1
    ).astype(jnp.float32)  # (B, A, K*3)
    pred = decode_keypoints(kpt_l, anchors, strides)  # (B, A, K, 3) px + vis prob
    vis_logit = kpt_l.reshape(*pred.shape)[..., 2]    # raw logits for the BCE

    assigned, w_fg, norm = aux["assigned_gt"], aux["w_fg"], aux["norm"]
    tgt = jnp.take_along_axis(gt_kpts, assigned[..., None, None], axis=1)  # (B, A, K, 3)
    tgt_boxes = jnp.take_along_axis(gt_boxes, assigned[..., None], axis=1)
    area = jnp.maximum(
        (tgt_boxes[..., 2] - tgt_boxes[..., 0]) * (tgt_boxes[..., 3] - tgt_boxes[..., 1]),
        1.0,
    )  # (B, A)

    k = pred.shape[-2]
    sigma = 1.0 / k
    kpt_mask = (tgt[..., 2] > 0).astype(jnp.float32)  # (B, A, K)
    d2 = jnp.sum((pred[..., :2] - tgt[..., :2]) ** 2, axis=-1)  # (B, A, K)
    e = d2 / (2.0 * area[..., None] * (2.0 * sigma) ** 2 + 1e-9)
    oks_term = (1.0 - jnp.exp(-e)) * kpt_mask
    per_anchor = jnp.sum(oks_term, axis=-1) / jnp.maximum(jnp.sum(kpt_mask, axis=-1), 1.0)
    loss_kpt = jnp.sum(per_anchor * w_fg) / norm

    bce_v = optax_sigmoid_bce(vis_logit, kpt_mask)
    loss_kobj = jnp.sum(jnp.mean(bce_v, axis=-1) * w_fg) / norm

    total = det_total + kpt_weight * loss_kpt + kobj_weight * loss_kobj
    metrics = dict(metrics, loss_kpt=loss_kpt, loss_kobj=loss_kobj, loss=total)
    return total, metrics
