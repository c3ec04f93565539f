"""Evaluate an OBB checkpoint: detection AP + rotation-angle error.

Produces the ``<ckpt>.metrics.json`` sidecar shipped with OBB checkpoints
(precision/recall/mAP50/mAP50-95 like `runs/obb/train/results.csv`, plus mean
and p90 angle error in degrees against the labeled polygon orientation).

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/eval_obb.py \
        --ckpt checkpoints/pallet_obb_1024.msgpack
"""

import argparse
import json

import numpy as np


def wrap_pi(d: np.ndarray) -> np.ndarray:
    """Wrap angle differences into (-pi/2, pi/2] (a rectangle's orientation is
    pi-periodic)."""
    return np.arctan2(np.sin(2.0 * d), np.cos(2.0 * d)) / 2.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/pallet_obb_1024.msgpack")
    ap.add_argument("--data", default="/root/reference/obb_hop_chu_nhat/val")
    ap.add_argument("--max-images", type=int, default=None)
    args = ap.parse_args()

    from PIL import Image

    from icp_slam_yolo_tpu.io.checkpoint import load_checkpoint
    from icp_slam_yolo_tpu.io.yolo_data import find_pairs, parse_polygons, polygon_angle
    from icp_slam_yolo_tpu.models.detect import Detector
    from icp_slam_yolo_tpu.models.eval import _iou_matrix, evaluate_detections

    payload, _, meta = load_checkpoint(args.ckpt)
    det = Detector(
        num_classes=meta.get("num_classes", 1),
        variant=meta.get("variant", "n"),
        family=meta.get("family", "v8"),
        task="obb",
        img_size=meta.get("img_size", 1024),
        params=payload,
        conf_threshold=0.001,  # AP needs the full PR sweep
    )

    pairs = find_pairs(args.data)
    if args.max_images:
        pairs = pairs[: args.max_images]
    preds, gts, angle_errs = [], [], []
    for ip, lp in pairs:
        img = np.asarray(Image.open(ip).convert("RGB"))
        h0, w0 = img.shape[:2]
        cls, polys = parse_polygons(lp)
        gt_boxes, gt_angles = [], []
        for poly in polys:
            px = poly * np.array([w0, h0])  # pixel space: uniform for angles
            lo, hi = px.min(0), px.max(0)
            gt_boxes.append([lo[0], lo[1], hi[0], hi[1]])
            gt_angles.append(polygon_angle(px))
        gt_boxes = np.array(gt_boxes, float).reshape(-1, 4)
        gt_angles = np.array(gt_angles, float)
        out = det(img)
        preds.append(out)
        gts.append({"boxes": gt_boxes, "classes": cls})

        # angle error over confident predictions matched at IoU >= 0.5
        conf = out["scores"] >= 0.5
        pboxes = out["boxes"][conf]
        pangles = np.asarray(out["angles"]).reshape(-1)[conf]
        if len(pboxes) and len(gt_boxes):
            iou = _iou_matrix(pboxes, gt_boxes)
            taken = np.zeros(len(gt_boxes), bool)
            for i in np.argsort(-out["scores"][conf]):
                row = np.where(taken, -1.0, iou[i])
                j = int(np.argmax(row))
                if row[j] >= 0.5:
                    taken[j] = True
                    angle_errs.append(abs(wrap_pi(pangles[i] - gt_angles[j])))

    metrics = evaluate_detections(preds, gts)
    errs = np.degrees(np.array(angle_errs)) if angle_errs else None
    metrics.update(
        # None (JSON null) when nothing matched — NaN is not valid JSON
        angle_error_mean_deg=round(float(errs.mean()), 2) if errs is not None else None,
        angle_error_p90_deg=round(float(np.percentile(errs, 90)), 2) if errs is not None else None,
        val_images=len(pairs),
        steps=meta.get("steps"),
        img_size=det.img_size,
    )
    metrics = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in metrics.items()}
    out_path = args.ckpt.replace(".msgpack", "") + ".metrics.json"
    with open(out_path, "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
