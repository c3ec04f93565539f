"""TPU check for the fused raster: parity vs the XLA path + b1/b8 timing.

Usage: python scripts/raster_fused_check.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench
from icp_slam_yolo_tpu.config import MapConfig, OccupancyConfig
from icp_slam_yolo_tpu.ops.raster import update_occupancy

B = 8


def main():
    mc = MapConfig(width_mm=12000.0, height_mm=12000.0)
    rng = np.random.default_rng(0)
    n, live = 512, 400
    pts = np.zeros((n, 2), np.float32)
    pts[:live] = rng.uniform(-2800, 2800, (live, 2))
    valid = np.zeros(n, bool)
    valid[:live] = True
    occ0 = jnp.full((mc.height_px, mc.width_px), 0.5, jnp.float32)
    args = (jnp.asarray(pts), jnp.asarray(valid), jnp.zeros(2, jnp.float32))

    oc_x = OccupancyConfig(window_px=100, max_ray_px=112, backend="xla")
    oc_f = OccupancyConfig(window_px=100, max_ray_px=112, backend="fused")
    fx = jax.jit(lambda o, p, v, r: update_occupancy(o, p, v, r, mc, oc_x))
    ff = jax.jit(lambda o, p, v, r: update_occupancy(o, p, v, r, mc, oc_f))
    ox = np.asarray(fx(occ0, *args))
    of = np.asarray(ff(occ0, *args))
    print("fused vs xla max diff:", np.abs(ox - of).max(), flush=True)
    ox2 = np.asarray(fx(jnp.asarray(ox), *args))
    of2 = np.asarray(ff(jnp.asarray(of), *args))
    print("round2 max diff:", np.abs(ox2 - of2).max(), flush=True)

    # timing: b8 vmapped, fused vs xla
    P = jnp.asarray(np.broadcast_to(pts, (B, n, 2)).copy())
    V = jnp.asarray(np.broadcast_to(valid, (B, n)).copy())
    R = jnp.asarray(np.broadcast_to(np.zeros(2, np.float32), (B, 2)).copy())
    O0 = jnp.asarray(np.broadcast_to(np.asarray(occ0), (B,) + occ0.shape).copy())

    for name, oc in [("fused", oc_f), ("xla", oc_x)]:
        one_b = jax.vmap(lambda o, p, v, r: update_occupancy(o, p, v, r, mc, oc))

        def mk(n_calls):
            @jax.jit
            def prog(p):
                def body(i, carry):
                    occ, pp = carry
                    occ2 = one_b(occ, pp, V, R)
                    return occ2, pp + 3.0
                occ, _ = jax.lax.fori_loop(0, n_calls, body, (O0, p))
                return jnp.sum(occ[..., 0])
            return prog, P

        p0, x0 = mk(0)
        pN, xN = mk(8)
        pert = lambda a, k: (a[0] + 1e-6 * k,)
        b0 = bench._timed_fetch(p0, (x0,), pert, repeats=3)
        tN = bench._timed_fetch(pN, (xN,), pert, repeats=3)
        print(f"raster_b8_{name}: {max(tN - b0, 1e-9) / 8 * 1e6:.1f} us/call", flush=True)


if __name__ == "__main__":
    main()
