"""Capture jax.profiler traces of the two hot paths and summarise device time.

SURVEY.md section 5 gap closure: the reference has no tracing at all; this
writes Perfetto-compatible traces (``*.trace.json.gz``, open at
https://ui.perfetto.dev) plus a machine-readable per-op device-time summary.

Two traced programs:
  * ``replay``  — `pipeline.run_sequence` over a Scan_data_1 prefix (the
    flagship sequential SLAM loop: fused ICP kernel + occupancy raster)
  * ``detect``  — a batch-8 640 px YOLO forward + decode + NMS

Usage (TPU host):
    python scripts/profile_trace.py \
        --out docs/traces
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import gzip
import json
import os


def device_op_summary(trace_dir: str, top: int = 12):
    """Aggregate device-lane complete events from the newest trace in
    ``trace_dir``: returns ``[(op name, total ms, calls)]`` sorted by time."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        return []
    data = json.loads(gzip.open(paths[-1]).read())
    events = data.get("traceEvents", [])
    lanes = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    device_pids = {pid for pid, name in lanes.items() if "TPU" in name or "device" in name}
    totals: dict[str, list[float]] = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids and e.get("dur"):
            t = totals.setdefault(e["name"], [0.0, 0])
            t[0] += e["dur"] / 1e3  # us -> ms
            t[1] += 1
    rows = sorted(totals.items(), key=lambda kv: -kv[1][0])[:top]
    return [(name, round(ms, 3), calls) for name, (ms, calls) in rows]


def trace_replay(out_dir: str, n_scans: int):
    import jax
    import jax.numpy as jnp

    from icp_slam_yolo_tpu.config import SlamConfig
    from icp_slam_yolo_tpu.io import scans as scans_io
    from icp_slam_yolo_tpu.slam import pipeline

    cfg = SlamConfig(map_capacity=8192)
    scans, _, _ = scans_io.load_sequence(
        "/root/reference/Scan_data_1", 1, n_scans + 1, n_max=cfg.n_max
    )
    scans = jnp.asarray(scans)

    @jax.jit
    def prog(x):
        state, outs = pipeline.run_sequence(x, cfg)
        return state.pose[0]

    float(prog(scans))  # compile outside the trace
    with jax.profiler.trace(out_dir):
        float(prog(scans + 1e-4))
    return device_op_summary(out_dir)


def trace_replay_realtime(out_dir: str, n_scans: int):
    """The shipped realtime preset (outlier + duplicate filters, rescue,
    maintenance) — the config whose quality numbers ship; its per-op profile
    drives the preset-vs-headline gap work (VERDICT r3 weak #4)."""
    import jax
    import jax.numpy as jnp

    from icp_slam_yolo_tpu.config import REALTIME_CONFIG
    from icp_slam_yolo_tpu.io import scans as scans_io
    from icp_slam_yolo_tpu.slam import pipeline

    cfg = REALTIME_CONFIG.replace(map_capacity=8192)
    scans, _, _ = scans_io.load_sequence(
        "/root/reference/Scan_data_1", 1, n_scans + 1, n_max=cfg.n_max
    )
    scans = jnp.asarray(scans)

    @jax.jit
    def prog(x):
        state, outs = pipeline.run_sequence(x, cfg)
        return state.pose[0]

    float(prog(scans))
    with jax.profiler.trace(out_dir):
        float(prog(scans + 1e-4))
    return device_op_summary(out_dir, top=20)


def trace_detect(out_dir: str, batch: int = 8, img_size: int = 640):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from icp_slam_yolo_tpu.models.detect import Detector

    det = Detector(num_classes=1, img_size=img_size)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, img_size, img_size, 3)), jnp.float32)

    @jax.jit
    def prog(img):
        dets, _, _ = det._predict_impl(
            det.params, det.batch_stats, img, jnp.float32(0.5), jnp.float32(0.45)
        )
        return jnp.max(dets.scores)

    float(prog(x))
    with jax.profiler.trace(out_dir):
        float(prog(x + 1e-6))
    return device_op_summary(out_dir)


def trace_train(out_dir: str, batch: int = 16, img_size: int = 640):
    """One bf16-AMP detect train step (forward + TAL/CIoU/DFL loss + backward
    + SGD update) — drives the where-does-the-AMP-speedup-go question: the
    conv stack is bf16 but the assigner/loss pipeline stays f32."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from icp_slam_yolo_tpu.models.train import create_train_state, make_train_step
    from icp_slam_yolo_tpu.models.yolo import YOLO

    model = YOLO(num_classes=1, compute_dtype=jnp.bfloat16)
    state, tx = create_train_state(model, img_size, tx=optax.sgd(0.01, momentum=0.937))
    step = jax.jit(make_train_step(model, tx, img_size))
    rng = np.random.default_rng(0)
    batch_data = {
        "images": jnp.asarray(rng.uniform(0, 1, (batch, img_size, img_size, 3)), jnp.float32),
        "boxes": jnp.asarray(np.tile([[100.0, 100, 300, 260]], (batch, 8, 1)), jnp.float32),
        "classes": jnp.zeros((batch, 8), jnp.int32),
        "valid": jnp.ones((batch, 8), bool),
    }
    state, m = step(state, batch_data)
    float(m["loss"])  # compile + warm outside the trace
    with jax.profiler.trace(out_dir):
        state, m = step(state, dict(batch_data, images=batch_data["images"] + 1e-6))
        float(m["loss"])
    return device_op_summary(out_dir, top=20)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/traces")
    ap.add_argument("--scans", type=int, default=300)
    ap.add_argument("--modes", default="replay,replay_realtime,detect,train",
                    help="comma-separated subset of traced programs")
    args = ap.parse_args()

    modes = set(args.modes.split(","))
    summary = {}
    if os.path.exists(os.path.join(args.out, "summary.json")):
        summary = json.load(open(os.path.join(args.out, "summary.json")))
    for name, fn in (
        ("replay", lambda d: trace_replay(d, args.scans)),
        ("replay_realtime", lambda d: trace_replay_realtime(d, args.scans)),
        ("detect", trace_detect),
        ("train", trace_train),
    ):
        if name not in modes:
            continue
        d = os.path.join(args.out, name)
        os.makedirs(d, exist_ok=True)
        rows = fn(d)
        summary[name] = [
            {"op": op, "device_ms": ms, "calls": calls} for op, ms, calls in rows
        ]
        print(f"== {name}: top device ops ==")
        for op, ms, calls in rows:
            print(f"  {ms:10.2f} ms  x{calls:<6d} {op[:80]}")

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"traces + summary under {args.out} (open *.trace.json.gz at ui.perfetto.dev)")


if __name__ == "__main__":
    main()
