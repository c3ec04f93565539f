"""Time the non-ICP/non-raster pieces of the fleet step, plus the full step.

Usage: python scripts/profile_fleet_rest.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench
from icp_slam_yolo_tpu.config import IcpConfig, MapConfig, OccupancyConfig, SlamConfig
from icp_slam_yolo_tpu.io import scans as scans_io
from icp_slam_yolo_tpu.ops.outliers import dynamic_points_mask
from icp_slam_yolo_tpu.ops.raster import occupancy_keep_mask
from icp_slam_yolo_tpu.ops.voxel import compact, voxel_downsample
from icp_slam_yolo_tpu.parallel import fleet as fleet_mod
from icp_slam_yolo_tpu.slam import pipeline

B = 8

FLEET_CFG = SlamConfig(
    map=MapConfig(width_mm=12000.0, height_mm=12000.0),
    icp=IcpConfig(early_exit=False),
    occupancy=OccupancyConfig(window_px=100, max_ray_px=112, skip_dead_rays=False),
    map_capacity=4096,
)


def time_chain(make_prog, n_calls=8, repeats=3):
    p0, x0 = make_prog(0)
    perturb = lambda args, k: (args[0] + 1e-6 * k,)
    base = bench._timed_fetch(p0, (x0,), perturb, repeats=repeats)
    pN, xN = make_prog(n_calls)
    tN = bench._timed_fetch(pN, (xN,), perturb, repeats=repeats)
    return max(tN - base, 1e-9) / n_calls


def batched_points(n, live, scale=4000.0):
    rng = np.random.default_rng(0)
    xy = np.zeros((B, n, 2), np.float32)
    xy[:, :live] = rng.uniform(-scale, scale, (B, live, 2))
    v = np.zeros((B, n), bool)
    v[:, :live] = True
    return jnp.asarray(xy), jnp.asarray(v)


def bench_op(fn, xy, extra=(), n_calls=16):
    def make_prog(n):
        @jax.jit
        def prog(p):
            def body(i, pp):
                out = fn(pp, *extra)
                return pp + jnp.sum(out) * 1e-9 + 1.0
            return jnp.sum(jax.lax.fori_loop(0, n, body, p))
        return prog, xy
    return time_chain(make_prog, n_calls=n_calls)


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    res = {}

    # batched scan voxel downsample (512 slots)
    xy, v = batched_points(512, 400)
    vds = jax.vmap(lambda x, vv: voxel_downsample(x, vv, 20.0)[0].sum())
    res["voxel_512_b8"] = bench_op(lambda p: vds(p, v), xy)

    # batched map voxel downsample (4608 slots: map 4096 + scan 512)
    xy2, v2 = batched_points(4608, 2500)
    vds2 = jax.vmap(lambda x, vv: voxel_downsample(x, vv, 20.0)[0].sum())
    res["voxel_4608_b8"] = bench_op(lambda p: vds2(p, v2), xy2)

    # batched compact (4608 -> 4096)
    cmp2 = jax.vmap(lambda x, vv: compact(x, vv, 4096)[0].sum())
    res["compact_4608_b8"] = bench_op(lambda p: cmp2(p, v2), xy2)

    # batched dynamic-points mask (512 vs 512)
    pxy, pv = batched_points(512, 400)
    dyn = jax.vmap(lambda a, b: dynamic_points_mask(a, v[0] * 0 + True, b, pv[0], 250.0).sum())
    res["dynamic_512_b8"] = bench_op(lambda p: dyn(p, pxy).astype(jnp.float32), xy)

    # batched occupancy keep mask (4608 points vs 400x400 grid)
    map_cfg = FLEET_CFG.map
    occ = jnp.full((B, map_cfg.height_px, map_cfg.width_px), 0.5, jnp.float32)
    okm = jax.vmap(
        lambda x, vv, o: occupancy_keep_mask(x, vv, o, map_cfg, 0.2).sum().astype(jnp.float32)
    )
    res["keepmask_4608_b8"] = bench_op(lambda p: okm(p, v2, occ), xy2)

    # the full fleet step (current config)
    scans, _, _ = scans_io.load_sequence("/root/reference/Scan_data_1", 1, 10, n_max=512)
    scan_b = jnp.asarray(np.broadcast_to(scans[1], (B,) + scans[1].shape).copy())
    states = fleet_mod.fleet_init(jnp.asarray(np.broadcast_to(scans[0], (B,) + scans[0].shape).copy()), FLEET_CFG)
    fstep = fleet_mod.make_fleet_step(FLEET_CFG)

    def full(p):
        st, outs, stats = fstep(states, p)
        return st.pose * 1e-9

    def make_prog(n):
        @jax.jit
        def prog(p):
            def body(i, pp):
                out = full(pp)
                return pp + jnp.sum(out) * 1e-9 + 0.1
            return jnp.sum(jax.lax.fori_loop(0, n, body, p))
        return prog, scan_b
    res["full_step_b8_current"] = time_chain(make_prog, n_calls=8)

    # full step with the fast ICP flags + compacted target + motion model
    fast_cfg = FLEET_CFG.replace(
        icp=IcpConfig(early_exit=True), motion_model=True, local_map_capacity=2048
    )
    states2 = fleet_mod.fleet_init(jnp.asarray(np.broadcast_to(scans[0], (B,) + scans[0].shape).copy()), fast_cfg)
    fstep2 = fleet_mod.make_fleet_step(fast_cfg)

    def make_prog2(n):
        @jax.jit
        def prog(p):
            def body(i, pp):
                st, outs, stats = fstep2(states2, pp)
                return pp + jnp.sum(st.pose) * 1e-9 + 0.1
            return jnp.sum(jax.lax.fori_loop(0, n, body, p))
        return prog, scan_b
    res["full_step_b8_fastflags"] = time_chain(make_prog2, n_calls=8)

    for k, t in res.items():
        print(f"{k:28s}: {t * 1e6:9.1f} us/call", file=sys.stderr)
    print(res)


if __name__ == "__main__":
    main()
