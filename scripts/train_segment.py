"""Train the segmentation variant on polygon labels and report mask IoU.

Uses the reference's polygon-labeled dataset (`obb_hop_chu_nhat`) with masks
rasterised from the label polygons — the capability class of the seg models
the reference's auto-labeler consumes.  Usage:
    python scripts/train_segment.py --steps 3000
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/obb_hop_chu_nhat")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"],
                    help="forward/backward compute dtype; params stay float32 "
                         "(the reference trains AMP, `train2/args.yaml` amp: true)")
    ap.add_argument("--out", default="/tmp/seg_ckpt")
    args = ap.parse_args()

    import jax.numpy as jnp

    from icp_slam_yolo_tpu.io.checkpoint import save_checkpoint
    from icp_slam_yolo_tpu.io.yolo_data import DeviceYoloDataset
    from icp_slam_yolo_tpu.models.train import create_train_state, make_train_step
    from icp_slam_yolo_tpu.models.yolo import YOLO

    ds = DeviceYoloDataset(args.data + "/training", img_size=args.img_size,
                           batch_size=args.batch_size, max_gt=8, task="segment")
    print(f"segment train images: {len(ds)}", flush=True)
    model = YOLO(num_classes=1, task="segment", compute_dtype=jnp.dtype(args.dtype))
    state, tx = create_train_state(model, args.img_size, total_steps=args.steps)
    step_fn = jax.jit(make_train_step(model, tx, args.img_size))
    it = iter(ds)
    t0 = time.time()
    for i in range(args.steps):
        state, m = step_fn(state, next(it))
        if (i + 1) % 100 == 0 or i == 0:
            print(f"step {i+1}/{args.steps} loss={float(m['loss']):.3f} "
                  f"mask={float(m['loss_mask']):.3f} fg={int(m['num_fg'])} "
                  f"({(time.time()-t0)/(i+1):.2f}s/step)", flush=True)
    save_checkpoint(args.out, state.params, state.batch_stats,
                    meta={"img_size": args.img_size, "num_classes": 1, "variant": "n",
                          "task": "segment", "steps": args.steps})
    print(f"checkpoint saved to {args.out}", flush=True)

    # mask-IoU eval on val: best detection's mask vs the first gt instance mask
    from icp_slam_yolo_tpu.models.eval import evaluate_segment_checkpoint

    metrics = evaluate_segment_checkpoint(args.out, args.data + "/val", args.img_size,
                                          max_images=None)  # full val split (78 images)
    print("VAL MASK METRICS: " + json.dumps(metrics), flush=True)
    with open(args.out + ".metrics.json", "w") as f:
        json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
