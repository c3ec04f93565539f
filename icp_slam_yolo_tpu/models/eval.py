"""Detection evaluation: COCO-style AP at configurable IoU thresholds.

Produces the metrics the reference reports from Ultralytics training
(`train2/results.csv`: precision, recall, mAP50, mAP50-95) for our detector,
so parity against BASELINE.md's 0.995 mAP50 is measurable.
"""

from __future__ import annotations

import numpy as np


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def average_precision(tp: np.ndarray, scores: np.ndarray, n_gt: int) -> float:
    """101-point interpolated AP from per-detection TP flags."""
    if n_gt == 0 or len(tp) == 0:
        return 0.0
    order = np.argsort(-scores)
    tp = tp[order]
    cum_tp = np.cumsum(tp)
    cum_fp = np.cumsum(~tp)
    recall = cum_tp / n_gt
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
    ap = 0.0
    for r in np.linspace(0, 1, 101):
        mask = recall >= r
        ap += precision[mask].max() if mask.any() else 0.0
    return ap / 101


def evaluate_detections(predictions: list[dict], ground_truths: list[dict], iou_thresholds=None):
    """Args: per-image dicts — predictions ``{boxes (N,4), scores (N,), classes (N,)}``,
    ground truths ``{boxes (M,4), classes (M,)}`` (same pixel space).

    Returns dict with precision/recall at 0.5 IoU and mAP50 / mAP50-95
    (single- or multi-class: AP averaged over classes present in gt).
    """
    iou_thresholds = iou_thresholds if iou_thresholds is not None else np.arange(0.5, 1.0, 0.05)
    classes = sorted({int(c) for gt in ground_truths for c in np.asarray(gt["classes"]).tolist()})
    if not classes:
        return {"precision": 0.0, "recall": 0.0, "mAP50": 0.0, "mAP50_95": 0.0}

    aps = np.zeros((len(classes), len(iou_thresholds)))
    p50 = r50 = 0.0
    for ci, cls in enumerate(classes):
        for ti, thr in enumerate(iou_thresholds):
            tps, scs, n_gt = [], [], 0
            for pred, gt in zip(predictions, ground_truths):
                gmask = np.asarray(gt["classes"]) == cls
                gboxes = np.asarray(gt["boxes"], float).reshape(-1, 4)[gmask]
                n_gt += len(gboxes)
                pmask = np.asarray(pred["classes"]) == cls
                pboxes = np.asarray(pred["boxes"], float).reshape(-1, 4)[pmask]
                pscores = np.asarray(pred["scores"], float)[pmask]
                order = np.argsort(-pscores)
                pboxes, pscores = pboxes[order], pscores[order]
                iou = _iou_matrix(pboxes, gboxes)
                taken = np.zeros(len(gboxes), bool)
                for i in range(len(pboxes)):
                    # greedy COCO/Ultralytics matching: best *untaken* gt above
                    # the threshold (argmax over a taken gt must not shadow a
                    # free one)
                    if len(gboxes):
                        row = np.where(taken, -1.0, iou[i])
                        j = int(np.argmax(row))
                        ok = row[j] >= thr
                    else:
                        ok = False
                    if ok:
                        taken[j] = True
                    tps.append(ok)
                    scs.append(pscores[i])
            tps_a, scs_a = np.asarray(tps, bool), np.asarray(scs)
            aps[ci, ti] = average_precision(tps_a, scs_a, n_gt)
            if ti == 0:
                # precision/recall at the max-F1 confidence (Ultralytics
                # semantics — `train2/results.csv` P/R columns): evaluating
                # the whole conf=0.001 list (needed for AP) would count
                # sub-threshold false positives no deployment ever sees.
                order = np.argsort(-scs_a)
                cum_tp = np.cumsum(tps_a[order])
                cum_fp = np.cumsum(~tps_a[order])
                prec = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
                rec = cum_tp / max(n_gt, 1)
                f1 = 2 * prec * rec / np.maximum(prec + rec, 1e-9)
                k = int(np.argmax(f1)) if len(f1) else 0
                if len(f1):
                    p50 += float(prec[k])
                    r50 += float(rec[k])

    return {
        "precision": float(p50 / len(classes)),
        "recall": float(r50 / len(classes)),
        "mAP50": float(aps[:, 0].mean()),
        "mAP50_95": float(aps.mean()),
    }


def evaluate_detector(detector, dataset_root: str, img_size: int, max_images: int | None = None,
                      conf_threshold: float = 0.001):
    """Run a Detector over a YOLO-layout val set and compute the metrics."""
    from icp_slam_yolo_tpu.io.yolo_data import find_pairs, load_example

    old_conf = detector.conf_threshold
    detector.conf_threshold = conf_threshold  # AP needs the full PR sweep
    preds, gts = [], []
    try:
        pairs = find_pairs(dataset_root)
        if max_images:
            pairs = pairs[:max_images]
        import jax.numpy as jnp

        for ip, lp in pairs:
            img, cls, boxes, _ = load_example(ip, lp, img_size)
            dets = detector.predict_batch(jnp.asarray(img[None]))
            valid = np.asarray(dets.valid[0])
            preds.append({
                "boxes": np.asarray(dets.boxes[0])[valid],
                "scores": np.asarray(dets.scores[0])[valid],
                "classes": np.asarray(dets.classes[0])[valid],
            })
            gts.append({"boxes": boxes, "classes": cls})
    finally:
        detector.conf_threshold = old_conf
    return evaluate_detections(preds, gts)
