"""Train the OBB detector on the reference's rotated-box dataset.

Mirrors `runs/obb/train/args.yaml` (yolo11n-obb class) on `obb_hop_chu_nhat`
(polygon labels -> enclosing boxes + angles).  Usage:
    python scripts/train_obb.py --steps 800
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
    ap.add_argument("--data", default="/root/reference/obb_hop_chu_nhat")
    ap.add_argument("--img-size", type=int, default=640)  # ref used 1024; 640 fits the chip budget
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--family", default="v8", choices=["v8", "v11", "v12"])
    ap.add_argument("--out", default="/tmp/obb_ckpt")
    args = ap.parse_args()

    from icp_slam_yolo_tpu.io.checkpoint import save_checkpoint
    from icp_slam_yolo_tpu.io.yolo_data import DeviceYoloDataset
    from icp_slam_yolo_tpu.models.train import create_train_state, make_train_step
    from icp_slam_yolo_tpu.models.yolo import YOLO

    ds = DeviceYoloDataset(args.data + "/training", img_size=args.img_size,
                     batch_size=args.batch_size, max_gt=16, task="obb")
    print(f"obb train images: {len(ds)}", flush=True)
    model = YOLO(num_classes=1, task="obb", family=args.family)
    state, tx = create_train_state(model, args.img_size, total_steps=args.steps)
    step_fn = jax.jit(make_train_step(model, tx, args.img_size))
    it = iter(ds)
    t0 = time.time()
    for i in range(args.steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        state, m = step_fn(state, batch)
        if (i + 1) % 50 == 0 or i == 0:
            print(
                f"step {i+1}/{args.steps} loss={float(m['loss']):.3f} "
                f"angle={float(m.get('loss_angle', 0)):.3f} fg={int(m['num_fg'])} "
                f"({(time.time()-t0)/(i+1):.2f}s/step)",
                flush=True,
            )
    save_checkpoint(args.out, state.params, state.batch_stats,
                    meta={"img_size": args.img_size, "num_classes": 1, "variant": "n",
                          "task": "obb", "family": args.family, "steps": args.steps})
    print(f"checkpoint saved to {args.out}", flush=True)


if __name__ == "__main__":
    main()
