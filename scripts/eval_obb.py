"""Evaluate an OBB checkpoint: detection AP + rotation-angle error.

Produces the ``<ckpt>.metrics.json`` sidecar shipped with OBB checkpoints
(precision/recall/mAP50/mAP50-95 like `runs/obb/train/results.csv`, plus mean
and p90 angle error in degrees against the labeled polygon orientation).

    python scripts/eval_obb.py \
        --ckpt checkpoints/pallet_obb_1024.msgpack
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="checkpoints/pallet_obb_1024.msgpack")
    ap.add_argument("--data", default="/root/reference/obb_hop_chu_nhat/val")
    ap.add_argument("--max-images", type=int, default=None)
    args = ap.parse_args()

    from icp_slam_yolo_tpu.io.checkpoint import load_checkpoint
    from icp_slam_yolo_tpu.models.detect import Detector
    from icp_slam_yolo_tpu.models.eval import evaluate_obb_detector

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

    metrics = evaluate_obb_detector(det, args.data, max_images=args.max_images)
    metrics.update(steps=meta.get("steps"), img_size=det.img_size)
    metrics = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in metrics.items()}
    out_path = args.ckpt.replace(".msgpack", "") + ".metrics.json"
    with open(out_path, "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
