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
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/train_pose.py --steps 3000
"""

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
    """Corner-keypoint quality of a pose checkpoint on (image, label) pairs.

    Reports mean/p90 corner error in ORIGINAL-frame pixels, PCK@0.1 (corner
    within 10% of the gt bbox diagonal), mean OKS, and detection recall.
    """
    from PIL import Image

    from icp_slam_yolo_tpu.io.checkpoint import load_checkpoint
    from icp_slam_yolo_tpu.io.yolo_data import parse_pose_label
    from icp_slam_yolo_tpu.models.detect import Detector

    payload, batch_stats, meta = load_checkpoint(ckpt_path)
    det = Detector(num_classes=1, task="pose", img_size=img_size,
                   conf_threshold=0.25, params=payload)

    errs, oks_all, hits, n_det, n_img = [], [], 0, 0, 0
    for ip, lp in val_pairs:
        cls, boxes, kpts = parse_pose_label(lp)
        if not len(cls):
            continue
        n_img += 1
        img = np.asarray(Image.open(ip).convert("RGB"))
        h0, w0 = img.shape[:2]
        out = det(img)
        if not len(out["boxes"]):
            continue
        n_det += 1
        best = int(np.argmax(out["scores"]))
        pred = out["keypoints"][best]  # (K, 3) original px
        gt = kpts[0].copy()
        gt[:, 0] *= w0
        gt[:, 1] *= h0
        vis = gt[:, 2] > 0
        d = np.linalg.norm(pred[:, :2] - gt[:, :2], axis=1)[vis]
        bw = (boxes[0, 2]) * w0
        bh = (boxes[0, 3]) * h0
        diag = float(np.hypot(bw, bh))
        errs.extend(d.tolist())
        hits += int(np.sum(d <= 0.1 * diag))
        area = max(bw * bh, 1.0)
        sigma = 1.0 / gt.shape[0]
        oks = np.mean(np.exp(-(d ** 2) / (2 * area * (2 * sigma) ** 2)))
        oks_all.append(float(oks))

    errs = np.asarray(errs)
    return {
        "n_val": n_img,
        "detection_recall": n_det / max(n_img, 1),
        "corner_err_mean_px": float(errs.mean()) if len(errs) else None,
        "corner_err_p90_px": float(np.percentile(errs, 90)) if len(errs) else None,
        "pck_0.1": hits / max(len(errs), 1),
        "oks_mean": float(np.mean(oks_all)) if oks_all else None,
        "img_size": img_size,
    }


if __name__ == "__main__":
    main()
