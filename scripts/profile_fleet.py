"""Profile the vmapped fleet path component-by-component on the real TPU.

Where do the 6 ms/robot of the B=8 fleet go?  Times (in-graph chain protocol,
see bench.py) the fused ICP kernel and the occupancy raster under vmap with
every flag combination, against their sequential (B=1) fast-path settings.

Each chained call does FRESH work: the ICP init restarts a fixed distance from
the optimum every call (otherwise the chain converges after call 1 and the
marginal cost collapses to the converged-in-2-iters latency), and the raster
points move per call.

Usage: python scripts/profile_fleet.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import bench
from icp_slam_yolo_tpu.config import MapConfig, OccupancyConfig
from icp_slam_yolo_tpu.ops.pallas.icp_fused import icp_fused_pallas
from icp_slam_yolo_tpu.ops.raster import update_occupancy


def time_chain(make_prog, n_calls=8, repeats=3):
    """Marginal seconds per call of an in-graph chained program."""
    p0, x0 = make_prog(0)
    perturb = lambda args, k: (args[0] + 1e-6 * k,)
    base = bench._timed_fetch(p0, (x0,), perturb, repeats=repeats)
    pN, xN = make_prog(n_calls)
    tN = bench._timed_fetch(pN, (xN,), perturb, repeats=repeats)
    return max(tN - base, 1e-9) / n_calls


def icp_inputs(batch, n_src=512, n_tgt=4096, n_src_live=272, n_tgt_live=2500):
    src, tgt = bench._load_pair()
    rng = np.random.default_rng(0)
    sxy = np.zeros((n_src, 2), np.float32)
    m = min(len(src), n_src_live)
    sxy[:m] = src[:m]
    sv = np.zeros(n_src, bool)
    sv[:m] = True
    txy = np.zeros((n_tgt, 2), np.float32)
    # tile the target cloud to n_tgt_live points (map-buffer realism)
    reps = -(-n_tgt_live // len(tgt))
    big = np.concatenate([tgt + rng.normal(0, 5, tgt.shape) for _ in range(reps)])
    txy[:n_tgt_live] = big[:n_tgt_live]
    tv = np.zeros(n_tgt, bool)
    tv[:n_tgt_live] = True
    if batch:
        sxy = np.broadcast_to(sxy, (batch, n_src, 2)).copy()
        sv = np.broadcast_to(sv, (batch, n_src)).copy()
        txy = np.broadcast_to(txy, (batch, n_tgt, 2)).copy()
        tv = np.broadcast_to(tv, (batch, n_tgt)).copy()
    return map(jnp.asarray, (sxy, sv, txy, tv))


def bench_icp(batch, early_exit, n_calls=8, n_tgt=4096, iters=50):
    S, SV, T, TV = icp_inputs(batch, n_tgt=n_tgt)

    def one(s, sv, t, tv, init):
        pose, rmse, n_in, n_it = icp_fused_pallas(
            s, sv, t, tv, init, iters=iters, early_exit=early_exit
        )
        return pose, n_it

    if batch:
        one_b = jax.vmap(one, in_axes=(0, 0, 0, 0, 0))
        init0 = jnp.zeros((batch, 3), jnp.float32)
    else:
        one_b = one
        init0 = jnp.zeros(3, jnp.float32)

    def make_prog(n):
        @jax.jit
        def prog(z):
            # every call restarts ~60 mm / 0.04 rad from the optimum (fresh
            # realistic work) while still data-depending on the previous call
            def body(i, carry):
                z, it_acc = carry
                off = jnp.stack([
                    60.0 + 0.01 * i, -40.0 - 0.01 * i, 0.04 + 1e-4 * i
                ])
                init = z * 1e-9 + (off if not batch else jnp.broadcast_to(off, (batch, 3)))
                pose, n_it = one_b(S, SV, T, TV, init)
                return pose, it_acc + jnp.sum(n_it)
            pose, it_acc = jax.lax.fori_loop(0, n, body, (z, jnp.int32(0)))
            return jnp.sum(pose) + it_acc.astype(jnp.float32) * 1e-9
        return prog, init0

    # also report mean iterations actually executed
    pose, n_it = jax.jit(lambda: one_b(S, SV, T, TV, init0 + jnp.asarray([60.0, -40.0, 0.04])))()
    mean_iters = float(jnp.mean(n_it.astype(jnp.float32)))
    return time_chain(make_prog, n_calls=n_calls), mean_iters


def bench_raster(batch, skip_dead, n_calls=8, n_pts=512, n_live=400):
    map_cfg = MapConfig(width_mm=12000.0, height_mm=12000.0)
    occ_cfg = OccupancyConfig(window_px=100, max_ray_px=112, skip_dead_rays=skip_dead)
    rng = np.random.default_rng(0)
    pts = np.zeros((n_pts, 2), np.float32)
    pts[:n_live] = rng.uniform(-2800, 2800, (n_live, 2))
    valid = np.zeros(n_pts, bool)
    valid[:n_live] = True
    occ0 = np.full((map_cfg.height_px, map_cfg.width_px), 0.5, np.float32)
    robot = np.zeros(2, np.float32)

    if batch:
        P = jnp.asarray(np.broadcast_to(pts, (batch, n_pts, 2)).copy())
        O0 = jnp.asarray(np.broadcast_to(occ0, (batch,) + occ0.shape).copy())
        V = jnp.asarray(np.broadcast_to(valid, (batch, n_pts)).copy())
        R = jnp.asarray(np.broadcast_to(robot, (batch, 2)).copy())
        one_b = jax.vmap(
            lambda occ, p, v, r: update_occupancy(occ, p, v, r, map_cfg, occ_cfg)
        )
    else:
        P, O0 = jnp.asarray(pts), jnp.asarray(occ0)
        V, R = jnp.asarray(valid), jnp.asarray(robot)
        one_b = lambda occ, p, v, r: update_occupancy(occ, p, v, r, map_cfg, occ_cfg)

    def make_prog(n):
        @jax.jit
        def prog(p):
            def body(i, carry):
                occ, pp = carry
                occ2 = one_b(occ, pp, V, R)
                # move the endpoints a little each call: fresh rays
                return occ2, pp + 3.0
            occ, _ = jax.lax.fori_loop(0, n, body, (O0, p))
            return jnp.sum(occ[..., 0])
        return prog, P
    return time_chain(make_prog, n_calls=n_calls)


def main():
    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    res = {}
    jobs = [
        ("icp_b1_fast (early_exit+skip)", lambda: bench_icp(0, True)),
        ("icp_b1_slow (no exit/skip)", lambda: bench_icp(0, False)),
        ("icp_b8_slow (current fleet)", lambda: bench_icp(8, False)),
        ("icp_b8_fast (exit+skip vmapped)", lambda: bench_icp(8, True)),
        ("raster_b1_skip", lambda: (bench_raster(0, True), None)),
        ("raster_b1_noskip", lambda: (bench_raster(0, False), None)),
        ("raster_b8_noskip (current fleet)", lambda: (bench_raster(8, False), None)),
        ("raster_b8_skip", lambda: (bench_raster(8, True), None)),
    ]
    for name, fn in jobs:
        try:
            t, extra = fn()
            res[name] = t
            note = f"  (mean iters {extra:.1f})" if extra is not None else ""
            print(f"{name:36s}: {t * 1e6:9.1f} us/call{note}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s}: FAILED {type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
    print(res)


if __name__ == "__main__":
    main()
