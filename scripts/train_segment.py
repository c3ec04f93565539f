"""Train the segmentation variant on polygon labels and report mask IoU.

Uses the reference's polygon-labeled dataset (`obb_hop_chu_nhat`) with masks
rasterised from the label polygons — the capability class of the seg models
the reference's auto-labeler consumes.  Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/train_segment.py --steps 3000
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/reference/obb_hop_chu_nhat")
    ap.add_argument("--img-size", type=int, default=320)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--out", default="/tmp/seg_ckpt")
    args = ap.parse_args()

    from icp_slam_yolo_tpu.io.checkpoint import save_checkpoint
    from icp_slam_yolo_tpu.io.yolo_data import DeviceYoloDataset
    from icp_slam_yolo_tpu.models.train import create_train_state, make_train_step
    from icp_slam_yolo_tpu.models.yolo import YOLO

    ds = DeviceYoloDataset(args.data + "/training", img_size=args.img_size,
                           batch_size=args.batch_size, max_gt=8, task="segment")
    print(f"segment train images: {len(ds)}", flush=True)
    model = YOLO(num_classes=1, task="segment")
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
    from icp_slam_yolo_tpu.io.yolo_data import (
        find_pairs, load_example, map_polygon, parse_polygons, rasterize_polygon,
    )
    from icp_slam_yolo_tpu.models.segment import assemble_masks
    from icp_slam_yolo_tpu.models.yolo import decode_predictions

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    fwd = jax.jit(lambda x: model.apply(variables, x, train=False))
    sp = args.img_size // 4
    ious = []
    for ip, lp in find_pairs(args.data + "/val")[:60]:
        img, cls, boxes, (_, _, _, w0, h0) = load_example(ip, lp, args.img_size)
        outs, protos = fwd(jnp.asarray(img[None]))
        b, s, coefs = decode_predictions(outs, args.img_size)
        top = int(np.argmax(np.asarray(s[0, :, 0])))
        mask = np.asarray(assemble_masks(protos[0], coefs[0, top:top + 1], b[0, top:top + 1], args.img_size))[0]
        _, polys = parse_polygons(lp)
        if not polys:
            continue
        gt = rasterize_polygon(map_polygon(polys[0], w0, h0, args.img_size) * (sp / args.img_size), sp)
        pred = mask >= 0.5
        inter = float(np.logical_and(pred, gt > 0).sum())
        union = float(np.logical_or(pred, gt > 0).sum())
        if union > 0:
            ious.append(inter / union)
    ious = np.array(ious)
    metrics = {"mask_iou_mean": float(ious.mean()), "mask_iou_p10": float(np.percentile(ious, 10)),
               "n_val": int(len(ious))}
    print("VAL MASK METRICS: " + json.dumps(metrics), flush=True)
    with open(args.out + ".metrics.json", "w") as f:
        json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    main()
