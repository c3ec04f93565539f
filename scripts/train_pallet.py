"""Train the pallet detector on the reference dataset and report mAP.

Mirrors the reference's detect training config (`train2/args.yaml`: 640 px,
batch 16, SGD) on the bundled `dataset_pallet` split.  Writes a checkpoint +
metrics JSON.  Usage:
    python scripts/train_pallet.py \
        --steps 1500 --out /tmp/pallet_ckpt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/dataset_pallet")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--eval-images", type=int, default=160)
    ap.add_argument("--eval-every", type=int, default=0,
                    help="evaluate mAP50 every N steps and record the first "
                         "crossing of --target-map50 (time-to-quality)")
    ap.add_argument("--target-map50", type=float, default=0.99)
    ap.add_argument("--family", default="v8", choices=["v8", "v11", "v12"])
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"],
                    help="forward/backward compute dtype; params stay float32 "
                         "(the reference trains AMP, `train2/args.yaml` amp: true)")
    ap.add_argument("--no-scale-aug", action="store_true",
                    help="disable the zoom-out augmentation (the reference recipe "
                         "trains with scale jitter, `train2/args.yaml` scale: 0.5)")
    ap.add_argument("--out", default="/tmp/pallet_ckpt")
    args = ap.parse_args()

    from icp_slam_yolo_tpu.io.checkpoint import save_checkpoint
    from icp_slam_yolo_tpu.io.yolo_data import DeviceYoloDataset
    from icp_slam_yolo_tpu.models.detect import Detector
    from icp_slam_yolo_tpu.models.eval import evaluate_detector
    from icp_slam_yolo_tpu.models.train import create_train_state, make_train_step
    from icp_slam_yolo_tpu.models.yolo import YOLO

    # device-resident dataset: per-step host->device transfers leak in this
    # environment (a batch-16 640px run OOM-killed the host at ~step 1150)
    scale_aug = () if args.no_scale_aug else (0.5, 0.67, 0.83, 1.0)
    ds = DeviceYoloDataset(args.data + "/train", img_size=args.img_size,
                           batch_size=args.batch_size, max_gt=16, augment=True,
                           scale_aug=scale_aug)
    print(f"train images: {len(ds)} (device-resident)", flush=True)
    model = YOLO(num_classes=1, family=args.family, compute_dtype=jnp.dtype(args.dtype))
    state, tx = create_train_state(model, args.img_size, total_steps=args.steps)
    step_fn = jax.jit(make_train_step(model, tx, args.img_size))

    it = iter(ds)
    t0 = time.time()
    train_elapsed = 0.0
    hit_step, hit_time = None, None
    for i in range(args.steps):
        state, metrics = step_fn(state, next(it))
        if (i + 1) % 50 == 0 or i == 0:
            print(
                f"step {i+1}/{args.steps} loss={float(metrics['loss']):.3f} "
                f"box={float(metrics['loss_box']):.3f} cls={float(metrics['loss_cls']):.3f} "
                f"dfl={float(metrics['loss_dfl']):.3f} fg={int(metrics['num_fg'])} "
                f"({(train_elapsed + time.time()-t0)/(i+1):.2f}s/step)",
                flush=True,
            )
        if (i + 1) % 250 == 0:
            save_checkpoint(args.out, state.params, state.batch_stats,
                            meta={"img_size": args.img_size, "num_classes": 1,
                                  "variant": "n", "task": "detect", "family": args.family, "steps": i + 1})
        # time-to-quality: periodic val eval until the target mAP50 is crossed
        # (eval wall time is excluded from the reported crossing time — the
        # reference's per-epoch `time` column likewise excludes its val pass)
        if args.eval_every and (i + 1) % args.eval_every == 0 and hit_step is None:
            train_elapsed += time.time() - t0
            det = Detector(num_classes=1, img_size=args.img_size, family=args.family,
                           params={"params": state.params, "batch_stats": state.batch_stats})
            m = evaluate_detector(det, args.data + "/val", args.img_size,
                                  max_images=args.eval_images)
            print(f"eval @ step {i+1}: mAP50={m['mAP50']:.4f} "
                  f"(train wall {train_elapsed:.0f}s)", flush=True)
            if m["mAP50"] >= args.target_map50:
                hit_step, hit_time = i + 1, train_elapsed
            t0 = time.time()

    if args.eval_every:
        train_elapsed += time.time() - t0
    save_checkpoint(args.out, state.params, state.batch_stats,
                    meta={"img_size": args.img_size, "num_classes": 1,
                          "variant": "n", "task": "detect", "family": args.family, "steps": args.steps})
    print(f"checkpoint saved to {args.out}", flush=True)

    det = Detector(num_classes=1, img_size=args.img_size, family=args.family,
                   params={"params": state.params, "batch_stats": state.batch_stats})
    m = evaluate_detector(det, args.data + "/val", args.img_size, max_images=args.eval_images)
    if args.eval_every:
        m["time_to_map50_target_s"] = round(hit_time, 1) if hit_step else None
        m["steps_to_map50_target"] = hit_step
        m["map50_target"] = args.target_map50
    print("VAL METRICS: " + json.dumps(m), flush=True)
    with open(args.out + ".metrics.json", "w") as f:
        json.dump(m, f, indent=2)


if __name__ == "__main__":
    main()
