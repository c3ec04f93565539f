"""Per-op device-time trace of the B=8 vmapped fleet replay (bench_fleet cfg).

Usage: python scripts/profile_fleet_trace.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax
import jax.numpy as jnp

from profile_trace import device_op_summary

from icp_slam_yolo_tpu.config import IcpConfig, MapConfig, OccupancyConfig, SlamConfig
from icp_slam_yolo_tpu.io import scans as scans_io
from icp_slam_yolo_tpu.parallel.fleet import fleet_run_sequence

B = 8
N = 100

cfg = SlamConfig(
    map=MapConfig(width_mm=12000.0, height_mm=12000.0),
    icp=IcpConfig(early_exit=True),
    motion_model=True,
    occupancy=OccupancyConfig(
        window_px=100, max_ray_px=112, skip_dead_rays=False,
        backend="fused", prune_window_margin_px=32,
    ),
    map_capacity=4096,
)

scans, _, _ = scans_io.load_sequence("/root/reference/Scan_data_1", 1, N + 1, n_max=cfg.n_max)
stack = jnp.asarray(np.stack([scans] * B))


@jax.jit
def prog(x):
    state, outs = fleet_run_sequence(x, cfg)
    return jnp.sum(state.pose)


out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fleet_trace"
float(prog(stack))
with jax.profiler.trace(out):
    float(prog(stack.at[:, :, :, 2].add(1e-4)))
rows = device_op_summary(out, top=24)
tot = sum(ms for _, ms, _ in rows)
print(f"== fleet B={B} x {N} scans: top device ops (sum {tot:.1f} ms) ==")
for op, ms, calls in rows:
    print(f"  {ms:10.2f} ms  x{calls:<6d} {op[:100]}")
