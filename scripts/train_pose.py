"""Train the pose variant: 4 ordered pallet-corner keypoints per detection.

The reference's labeler writes pose labels (bbox + 4 corners with visibility,
`labels_segmentation.py:107-112`) for all 799 `camera_data/` frames into
`output_pose/`, but the reference never trains on them — its corner pipeline
instead sorts detected OBB corners with heuristics (`obb2.py:7-104`).  A pose
model closes that loop: one frame -> ORDERED tl/tr/br/bl corners, directly
consumable by `stereo_to_3d` (`img.py:3-14`) and the PnP pose solver
(`obb2.py:105-126`) with no sorting heuristics.

Split is 80/20 seed 42 (the reference's own `chia.py:5-45` convention).
Usage:
    python scripts/train_pose.py --steps 3000
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import random
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default="/root/reference/camera_data")
    ap.add_argument("--labels", default="/root/reference/output_pose")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", default="/tmp/pose_ckpt")
    ap.add_argument("--eval-only", action="store_true", help="evaluate --out instead of training")
    args = ap.parse_args()

    import jax

    from icp_slam_yolo_tpu.io.checkpoint import save_checkpoint
    from icp_slam_yolo_tpu.io.yolo_data import DeviceYoloDataset, find_pairs
    from icp_slam_yolo_tpu.models.train import create_train_state, make_train_step
    from icp_slam_yolo_tpu.models.yolo import YOLO

    pairs = find_pairs(args.images, label_root=args.labels)
    random.Random(42).shuffle(pairs)  # `chia.py:5-45`: seed 42, 80/20
    n_train = int(len(pairs) * 0.8)
    train_pairs, val_pairs = pairs[:n_train], pairs[n_train:]
    print(f"pose dataset: {len(train_pairs)} train / {len(val_pairs)} val", flush=True)

    if not args.eval_only:
        ds = DeviceYoloDataset(args.images, img_size=args.img_size,
                               batch_size=args.batch_size, max_gt=4, task="pose",
                               augment=True, pairs=train_pairs,
                               scale_aug=(0.5, 0.67, 0.83, 1.0))
        model = YOLO(num_classes=1, task="pose")
        state, tx = create_train_state(model, args.img_size, total_steps=args.steps)
        step_fn = jax.jit(make_train_step(model, tx, args.img_size))
        it = iter(ds)
        t0 = time.time()
        for i in range(args.steps):
            state, m = step_fn(state, next(it))
            if (i + 1) % 100 == 0 or i == 0:
                print(f"step {i+1}/{args.steps} loss={float(m['loss']):.3f} "
                      f"kpt={float(m['loss_kpt']):.3f} kobj={float(m['loss_kobj']):.3f} "
                      f"box={float(m['loss_box']):.3f} fg={int(m['num_fg'])} "
                      f"({(time.time()-t0)/(i+1):.2f}s/step)", flush=True)
        save_checkpoint(args.out, state.params, state.batch_stats,
                        meta={"img_size": args.img_size, "num_classes": 1, "variant": "n",
                              "task": "pose", "n_kpt": 4, "steps": args.steps})
        print(f"checkpoint saved to {args.out}", flush=True)

    metrics = evaluate_pose_checkpoint(args.out, val_pairs, args.img_size)
    print(json.dumps(metrics, indent=2), flush=True)
    with open(args.out + ".metrics.json", "w") as f:
        json.dump(metrics, f, indent=2)


def evaluate_pose_checkpoint(ckpt_path: str, val_pairs, img_size: int) -> dict:
    """Corner-keypoint quality of a pose checkpoint on (image, label) pairs
    (see `models/eval.evaluate_pose_detector` for the metric definitions)."""
    from icp_slam_yolo_tpu.io.checkpoint import load_checkpoint
    from icp_slam_yolo_tpu.models.detect import Detector
    from icp_slam_yolo_tpu.models.eval import evaluate_pose_detector

    payload, _, meta = load_checkpoint(ckpt_path)
    det = Detector(num_classes=1, task="pose", img_size=img_size,
                   conf_threshold=0.25, params=payload)
    metrics = evaluate_pose_detector(det, val_pairs)
    metrics["img_size"] = img_size
    return metrics


if __name__ == "__main__":
    main()
