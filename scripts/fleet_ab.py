"""A/B fleet-step configs on real Scan_data_1 replay: throughput + accept rate.

Usage: python scripts/fleet_ab.py [n_scans]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench
from icp_slam_yolo_tpu.config import (
    IcpConfig, MapConfig, OccupancyConfig, SlamConfig, REALTIME_GATE,
)
from icp_slam_yolo_tpu.io import scans as scans_io
from icp_slam_yolo_tpu.parallel.fleet import fleet_run_sequence

B = 8
BASE = dict(
    map=MapConfig(width_mm=12000.0, height_mm=12000.0),
    map_capacity=4096,
)
VARIANTS = {
    "r2_current": SlamConfig(
        icp=IcpConfig(early_exit=False),
        occupancy=OccupancyConfig(window_px=100, max_ray_px=112, skip_dead_rays=False),
        **BASE,
    ),
    "fastflags": SlamConfig(
        icp=IcpConfig(early_exit=True),
        occupancy=OccupancyConfig(window_px=100, max_ray_px=112, skip_dead_rays=False),
        **BASE,
    ),
    "fast_compact": SlamConfig(
        icp=IcpConfig(early_exit=True),
        occupancy=OccupancyConfig(window_px=100, max_ray_px=112, skip_dead_rays=False),
        local_map_capacity=2048,
        **BASE,
    ),
    "fast_compact_motion": SlamConfig(
        icp=IcpConfig(early_exit=True),
        occupancy=OccupancyConfig(window_px=100, max_ray_px=112, skip_dead_rays=False),
        local_map_capacity=2048,
        motion_model=True,
        **BASE,
    ),
}


def run_variant(name, cfg, stack):
    @jax.jit
    def prog(x):
        state, outs = fleet_run_sequence(x, cfg)
        return jnp.sum(state.pose) + jnp.sum(outs.accepted) * 1e-9

    @jax.jit
    def accept(x):
        _, outs = fleet_run_sequence(x, cfg)
        return jnp.mean(outs.accepted.astype(jnp.float32))

    base = bench._measure_fetch_overhead()
    t = bench._timed_fetch(
        prog, (stack,), lambda a, k: (a[0].at[:, :, :, 2].add(1e-4 * k),), repeats=3
    )
    n_scans = stack.shape[1]
    rate = B * n_scans / max(t - base, 1e-9)
    acc = float(accept(stack))
    print(f"{name:22s}: {rate:8.1f} scans/s aggregate, accept {acc:.3f}", file=sys.stderr)
    return rate, acc


def main():
    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    scans, _, _ = scans_io.load_sequence("/root/reference/Scan_data_1", 1, n_scans + 1, n_max=512)
    stack = jnp.asarray(np.stack([scans] * B))
    res = {}
    for name, cfg in VARIANTS.items():
        try:
            res[name] = run_variant(name, cfg, stack)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
    print(res)


if __name__ == "__main__":
    main()
