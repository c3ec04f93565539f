"""Benchmark: ICP registration throughput, TPU vs the NumPy/SciPy CPU baseline.

Prints ONE JSON line:
  {"metric": "icp_registrations_per_sec", "value": N, "unit": "reg/s",
   "vs_baseline": X}

The workload is BASELINE.json config 1/5: register real Scan_data_1 pairs
(the reference's own demo pair, scans 350/355, gated + voxel-downsampled like
`gicp_lidar.py:20`), batched 64-wide with `vmap` on the TPU (config 5's
"vmap ICP over 64 scan streams").  The baseline is the float64 NumPy oracle —
the same algorithm the reference effectively runs (KDTree NN + Kabsch,
`labels_segmentation/icp.py`) — timed single-threaded on the host CPU.

Measurement protocol (the TPU is behind an async relay):
`jax.block_until_ready` on a relay array does NOT wait for device execution,
and Python-level chains of relay arrays degrade pathologically; the only sound
timing is *in-graph* chaining — run K data-dependent repetitions inside ONE
jitted program (`lax.fori_loop`, each call's output feeding the next call's
input so nothing can be elided or overlapped), fetch one scalar to the host
(which does wait), and subtract the same program at K=0 (pure dispatch+fetch
overhead, ~25 ms round trip).  Inputs are perturbed per outer repeat because
the relay content-caches identical executions.

Run with no args on the TPU host: `python bench.py`.  Secondary benchmarks:
`python bench.py --all` (human-readable extra lines on stderr).
"""

import argparse
import json
import sys
import time

import numpy as np


def _load_pair():
    from icp_slam_yolo_tpu.config import OFFLINE_GATE
    from icp_slam_yolo_tpu.io import scans as scans_io
    from icp_slam_yolo_tpu.reference_impl import oracle

    paths = scans_io.sequence_paths("/root/reference/Scan_data_1", 350, 356)
    if len(paths) >= 2:
        a, b = np.load(paths[0]), np.load(paths[-1])
    else:  # reference data unavailable: synthesize a wall scan
        rng = np.random.default_rng(0)
        ang = rng.uniform(0, 135, 300)
        a = np.stack([np.full(300, 40.0), ang, 3000 + 200 * np.sin(np.deg2rad(ang) * 4)], axis=1)
        b = a.copy()
        b[:, 2] += 30.0
    src = oracle.voxel_downsample(oracle.polar_gate(b, OFFLINE_GATE), 20.0)
    tgt = oracle.polar_gate(a, OFFLINE_GATE)
    return src, tgt


def bench_baseline(src, tgt, repeats: int = 20) -> float:
    """Oracle registrations/sec (float64 NumPy, single pair, CPU)."""
    from icp_slam_yolo_tpu.config import IcpConfig
    from icp_slam_yolo_tpu.reference_impl import oracle

    cfg = IcpConfig()
    oracle.icp(src, tgt, np.zeros(3), cfg)  # warm caches
    t0 = time.perf_counter()
    for _ in range(repeats):
        oracle.icp(src, tgt, np.zeros(3), cfg)
    return repeats / (time.perf_counter() - t0)


def _timed_fetch(fn, args, perturb, repeats: int = 4) -> float:
    """Median wall time of ``float(fn(*args))`` with per-repeat unique inputs
    (the relay content-caches identical executions).  ``perturb(args, k)``
    must return a uniquely-perturbed argument tuple.  ``k`` is salted with a
    per-process random offset so repeated bench calls (same process or not)
    never replay an input the relay has already seen — without the salt, a
    second call re-issues k=1..N and every repeat cache-hits, which makes
    ``tN - base`` collapse to ~0 and the reported rate explode."""
    import os

    salt = 1.0 + int.from_bytes(os.urandom(4), "little") % 997 / 997.0
    float(fn(*args))  # compile + warm
    times = []
    for k in range(repeats):
        a = perturb(args, (k + 1) * salt)
        t0 = time.perf_counter()
        float(fn(*a))
        times.append(time.perf_counter() - t0)
    return float(np.median(times[1:] if len(times) > 2 else times))


def _pad(p, mult):
    n = -(-len(p) // mult) * mult
    out = np.zeros((n, 2), np.float32)
    out[: len(p)] = p
    v = np.zeros(n, bool)
    v[: len(p)] = True
    return out, v


def _chain_icp(batch: int, n_calls: int, src, tgt, early_exit: bool):
    """Jitted program: ``n_calls`` data-dependent vmapped registrations."""
    import jax
    import jax.numpy as jnp

    from icp_slam_yolo_tpu.config import IcpConfig
    from icp_slam_yolo_tpu.core.registration import icp_masked

    cfg = IcpConfig(early_exit=early_exit)
    rng = np.random.default_rng(0)
    sxy, sv = _pad(src, 8)
    txy, tv = _pad(tgt, 128)
    inits = np.zeros((batch, 3), np.float32)
    inits[:, 2] = rng.uniform(-0.05, 0.05, batch)
    S = jnp.asarray(np.broadcast_to(sxy, (batch, len(sxy), 2)).copy())
    SV = jnp.asarray(np.broadcast_to(sv, (batch, len(sv))).copy())
    T = jnp.asarray(np.broadcast_to(txy, (batch, len(txy), 2)).copy())
    TV = jnp.asarray(np.broadcast_to(tv, (batch, len(tv))).copy())

    one = jax.vmap(lambda s, sv_, t, tv_, i: icp_masked(s, sv_, t, tv_, i, cfg))

    @jax.jit
    def prog(init):
        def body(_, p):
            res = one(S, SV, T, TV, p)
            # output feeds the next call's init: a true sequential dependency
            return p * 0.5 + res.pose * 0.5 + 1e-4
        out = jax.lax.fori_loop(0, n_calls, body, init)
        return jnp.sum(out)

    return prog, jnp.asarray(inits)


def bench_tpu(src, tgt, batch: int = 64, n_calls: int = 20) -> float:
    """TPU registrations/sec: `vmap`ped masked ICP over a 64-pair batch,
    timed as the marginal cost of in-graph chained calls."""
    perturb = lambda args, k: (args[0] + 1e-6 * k,)
    p0, init = _chain_icp(batch, 0, src, tgt, early_exit=False)
    base = _timed_fetch(p0, (init,), perturb)
    pN, init = _chain_icp(batch, n_calls, src, tgt, early_exit=False)
    tN = _timed_fetch(pN, (init,), perturb)
    return batch * n_calls / max(tN - base, 1e-9)


def bench_single_pair(src, tgt, n_calls: int = 2500):
    """B=1 registration latency in ms (the sequential-replay regime: the
    `lax.scan` replay path runs exactly one registration at a time, so this
    latency bounds full-replay scans/s).  Returns (converged, fixed-50-iter).

    2500 calls, not 100: a converged chain runs ~20-30 us/call, so a 100-call
    chain (~2-3 ms) sits below the relay's ~25 ms RTT jitter and the
    base-subtraction clamp reported 0.0 ms; even 1000 calls (~25 ms) left the
    converged reading swinging 2x between runs (0.035 vs 0.072 ms)."""
    out = []
    for early_exit in (True, False):
        perturb = lambda args, k: (args[0] + 1e-6 * k,)
        p0, init = _chain_icp(1, 0, src, tgt, early_exit=early_exit)
        base = _timed_fetch(p0, (init,), perturb)
        pN, init = _chain_icp(1, n_calls, src, tgt, early_exit=early_exit)
        tN = _timed_fetch(pN, (init,), perturb)
        # converged-chain latency is ~10-30 us/call; clamp the base-subtraction
        # noise (~RTT jitter) so the artifact never reports a negative latency
        out.append(max(0.0, (tN - base) / n_calls * 1e3))
    return out


def bench_sequence(n_scans: int = 300, preset: str | None = None) -> float:
    """Full SLAM loop Hz over a Scan_data_1 prefix (steady-state, compiled).
    `run_sequence` is one jitted `lax.scan` program — a single call IS the
    in-graph chain; fetching the final pose forces completion.

    ``preset`` measures a shipped config (the one the quality numbers are
    produced with — VERDICT r2: bench the presets you ship); None measures
    the plain-defaults config for round-over-round comparability."""
    import jax
    import jax.numpy as jnp

    from icp_slam_yolo_tpu.config import PRESETS, SlamConfig
    from icp_slam_yolo_tpu.io import scans as scans_io
    from icp_slam_yolo_tpu.slam import pipeline

    cfg = (PRESETS[preset] if preset else SlamConfig()).replace(map_capacity=8192)
    scans, _, _ = scans_io.load_sequence("/root/reference/Scan_data_1", 1, n_scans + 1, n_max=cfg.n_max)
    scans = jnp.asarray(scans)

    @jax.jit
    def prog(x):
        state, outs = pipeline.run_sequence(x, cfg)
        return state.pose[0] + jnp.sum(outs.rmse * 0)

    base = _measure_fetch_overhead()
    t = _timed_fetch(prog, (scans,), lambda a, k: (a[0].at[:, :, 2].add(1e-4 * k),), repeats=4)
    return len(scans) / max(t - base, 1e-9)


def _measure_fetch_overhead() -> float:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def trivial(x):
        return jnp.sum(x)

    z = jnp.zeros(8, jnp.float32)
    return _timed_fetch(trivial, (z,), lambda a, k: (a[0] + k,), repeats=4)


def bench_detect(batch: int = 8, img_size: int = 640, n_calls: int = 8,
                 pallas_convs: bool = True):
    """YOLO detect frames/sec (jitted conv + decode + NMS), in-graph chained.

    Returns ``(fps, model_gflop_per_image, achieved_tflops, mfu)``: the FLOP
    count comes from XLA's own cost analysis of the compiled forward program,
    and MFU is measured against the v5e's 394 TFLOP/s bf16 peak (197 if the
    compute dtype resolves to f32)."""
    import jax
    import jax.numpy as jnp

    from icp_slam_yolo_tpu.models.detect import Detector

    det = Detector(num_classes=1, img_size=img_size, pallas_convs=pallas_convs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, img_size, img_size, 3)), jnp.float32)
    params, stats = det.params, det.batch_stats

    def one(img):
        dets, _, _ = det._predict_impl(params, stats, img, jnp.float32(0.5), jnp.float32(0.45))
        return dets

    def chain(n):
        @jax.jit
        def prog(img):
            def body(_, im):
                d = one(im)
                # feed a scalar of the output back into the next input
                return im + jnp.max(d.scores) * 1e-6
            out = jax.lax.fori_loop(0, n, body, img)
            return jnp.sum(out[0, 0, 0])
        return prog

    perturb = lambda args, k: (args[0] + 1e-6 * k,)
    prog_n = chain(n_calls)
    base = _timed_fetch(chain(0), (x,), perturb, repeats=3)
    tN = _timed_fetch(prog_n, (x,), perturb, repeats=3)
    fps = batch * n_calls / max(tN - base, 1e-9)

    try:
        # reuse the already-compiled timing program (same jitted callable ->
        # cache hit).  XLA cost analysis counts a fori_loop body ONCE
        # regardless of trip count, so the chain's FLOPs are one call's.
        cost = prog_n.lower(x).compile().cost_analysis()
        flops_per_img = float(cost.get("flops", 0.0)) / batch
    except Exception:  # cost analysis is backend-dependent; FPS still stands
        flops_per_img = 0.0
    achieved = fps * flops_per_img / 1e12
    peak = 394.0 if "bfloat16" in str(det.model.compute_dtype) else 197.0
    return fps, flops_per_img / 1e9, achieved, achieved / peak


def bench_train(batch: int = 16, img_size: int = 640, n_calls: int = 4,
                compute_dtype=None) -> float:
    """Detect training steps/sec at the reference's config (`train2/args.yaml`
    batch 16, 640 px).  The reference's 368-epoch run averaged ~8.8 s/epoch =
    ~4.5 steps/s over 639 images (BASELINE.md row 5); one in-graph chained
    train step here is the comparable unit of work.

    ``compute_dtype=jnp.bfloat16`` measures the AMP step (the reference trains
    `amp: true`, `train2/args.yaml:28`): bf16 forward/backward off the MXU,
    f32 master params, f32 loss/stat accumulation — TPU-native AMP needs no
    loss scaling (bf16 shares f32's exponent range)."""
    import jax
    import jax.numpy as jnp
    import optax

    from icp_slam_yolo_tpu.models.train import create_train_state, make_train_step
    from icp_slam_yolo_tpu.models.yolo import YOLO

    model = YOLO(num_classes=1, compute_dtype=compute_dtype or jnp.float32)
    tx = optax.sgd(0.01, momentum=0.937)
    state, tx = create_train_state(model, img_size, tx=tx)
    step = make_train_step(model, tx, img_size)
    rng = np.random.default_rng(0)
    batch_data = {
        "images": jnp.asarray(rng.uniform(0, 1, (batch, img_size, img_size, 3)), jnp.float32),
        "boxes": jnp.asarray(
            np.tile(np.array([[100.0, 100.0, 300.0, 260.0]], np.float32), (batch, 8, 1)).reshape(batch, 8, 4)
        ),
        "classes": jnp.zeros((batch, 8), jnp.int32),
        "valid": jnp.ones((batch, 8), bool),
    }

    def chain(n):
        @jax.jit
        def prog(st, b):
            def body(_, carry):
                st, b = carry
                st, metrics = step(st, b)
                # data-dependence: perturb the images with the loss scalar
                b = dict(b, images=b["images"] + metrics["loss"] * 1e-12)
                return st, b
            st, b = jax.lax.fori_loop(0, n, body, (st, b))
            return st.params["stem"]["Conv_0"]["kernel"].sum() + b["images"][0, 0, 0, 0]
        return prog

    perturb = lambda args, k: (args[0], dict(args[1], images=args[1]["images"] + 1e-6 * k))
    base = _timed_fetch(chain(0), (state, batch_data), perturb, repeats=3)
    tN = _timed_fetch(chain(n_calls), (state, batch_data), perturb, repeats=3)
    return n_calls / max(tN - base, 1e-9)


def bench_fused(n_calls: int = 48, detect_every: int = 1, mode: str = "fused",
                pallas_convs: bool = True) -> float:
    """Fused SLAM+YOLO loop (BASELINE.json config 4): one tick = one SLAM
    scan step + one stereo-pair detect (batch-2 forward+decode+NMS), chained
    in ONE jitted program with a data dependency between the two (detections
    perturb the next scan, the pose perturbs the next frames).  The remaining
    landmark projection (`fusion/landmarks.py`) is O(us) host math.  Returns
    ticks/sec.

    ``detect_every=k`` is the trigger-faithful cadence: the reference only
    fires the camera when the robot is near a POI target (`mainn.py:376-382`
    gates `camera_queue.put` on `dentaX/dentaY < 650 mm`), so detect-every-
    tick overstates the per-tick perception cost; ``k`` ticks per detect runs
    the detect branch under `lax.cond` so skipped ticks pay ~zero detect time
    (both branches compile; only the taken one executes on TPU).

    ``mode``: "fused" | "slam_only" | "detect_only" — the _only modes time one
    half under the identical chain/fetch protocol, for an honest decomposition
    of the tick (VERDICT r3 weak #2: 2.13 ms/tick vs ~1.4 ms parts-sum was
    comparing against a batch-1 detect number; the stereo tick runs batch-2)."""
    import jax
    import jax.numpy as jnp

    from icp_slam_yolo_tpu.config import SlamConfig
    from icp_slam_yolo_tpu.io import scans as scans_io
    from icp_slam_yolo_tpu.models.detect import Detector
    from icp_slam_yolo_tpu.slam import pipeline

    cfg = SlamConfig(map_capacity=8192)
    scans, _, _ = scans_io.load_sequence("/root/reference/Scan_data_1", 1, 3, n_max=cfg.n_max)
    scan = jnp.asarray(scans[1])
    state0 = pipeline.init_state(jnp.asarray(scans[0]), cfg)
    step = pipeline.make_step(cfg)

    det = Detector(num_classes=1, img_size=640, pallas_convs=pallas_convs)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 1, (2, 640, 640, 3)), jnp.float32)
    params, stats = det.params, det.batch_stats

    def detect_top(fr):
        dets, _, _ = det._predict_impl(params, stats, fr, jnp.float32(0.5), jnp.float32(0.45))
        return jnp.max(dets.scores)

    def chain(n):
        @jax.jit
        def prog(st, sc, fr):
            def body(i, carry):
                st, sc, fr = carry
                if mode != "detect_only":
                    st, _ = step(st, sc)
                if mode == "slam_only":
                    top = jnp.float32(0.0)
                elif detect_every == 1:
                    top = detect_top(fr)
                else:
                    top = jax.lax.cond(
                        i % detect_every == 0, detect_top,
                        lambda _: jnp.float32(0.0), fr,
                    )
                # cross-dependencies: neither half can be elided or reordered
                sc = sc.at[:, 2].add(1e-4 + top * 1e-6)
                fr = fr + st.pose[0] * 1e-9 + top * 1e-9 + 1e-6
                return st, sc, fr
            st, sc, fr = jax.lax.fori_loop(0, n, body, (st, sc, fr))
            return st.pose[0] + jnp.sum(fr[0, 0, 0])
        return prog

    # perturb BOTH live inputs: in detect_only mode the scan argument is dead
    # and jit prunes it from the executable, so a scan-only perturbation never
    # reaches the relay and every repeat content-cache-hits (measured as a
    # 4.8e10 ticks/s reading); the frames feed the chain in every mode
    perturb = lambda args, k: (
        args[0], args[1].at[:, 2].add(1e-4 * k), args[2] + 1e-6 * k,
    )
    # This bench showed the widest run-to-run spread behind the relay (774 vs
    # 1,315 ticks/s on consecutive --all runs): at the old n_calls=8 the chain
    # ran ~8 ms of device work against a ~25 ms RTT base, so the subtraction
    # was mostly relay jitter.  48 ticks (~40-60 ms of signal) + repeats=6
    # puts the signal above the noise floor.
    base = _timed_fetch(chain(0), (state0, scan, frames), perturb, repeats=6)
    tN = _timed_fetch(chain(n_calls), (state0, scan, frames), perturb, repeats=6)
    return n_calls / max(tN - base, 1e-9)


def _fleet_bench_cfg():
    """The shipped `fleet` preset at bench-arena geometry.

    All semantics/flags come from `FLEET_CONFIG` (the config whose quality is
    gated in scripts/quality_check.py); only the arena shrinks to the
    dataset's actual extent — 11.52 m square keeps the 384 x 384 grid
    tile-shaped (H % 8, W % 128) so the DMA-window raster kernel stays
    eligible, and window 100 px / 4096-slot capacity match the round-1/2/3
    bench series for round-over-round comparability."""
    import dataclasses

    from icp_slam_yolo_tpu.config import FLEET_CONFIG, MapConfig

    return FLEET_CONFIG.replace(
        map=MapConfig(width_mm=11520.0, height_mm=11520.0),
        occupancy=dataclasses.replace(
            FLEET_CONFIG.occupancy, window_px=100, max_ray_px=112,
        ),
        map_capacity=4096,
    )


def bench_fleet(n_robots: int = 8, n_scans: int = 100) -> float:
    """Multi-robot fleet throughput: vmapped SLAM over n_robots streams
    (BASELINE.json config 5) — total scans/sec across the fleet, measured on
    the shipped `fleet` preset's flags (see `_fleet_bench_cfg`)."""
    import jax
    import jax.numpy as jnp

    from icp_slam_yolo_tpu.io import scans as scans_io
    from icp_slam_yolo_tpu.parallel.fleet import fleet_run_sequence

    cfg = _fleet_bench_cfg()
    scans, _, _ = scans_io.load_sequence("/root/reference/Scan_data_1", 1, n_scans + 1, n_max=cfg.n_max)
    stack = jnp.asarray(np.stack([scans] * n_robots))

    @jax.jit
    def prog(x):
        state, outs = fleet_run_sequence(x, cfg)
        return jnp.sum(state.pose)

    base = _measure_fetch_overhead()
    t = _timed_fetch(prog, (stack,), lambda a, k: (a[0].at[:, :, :, 2].add(1e-4 * k),), repeats=4)
    return n_robots * n_scans / max(t - base, 1e-9)


def bench_fleet_matched_single(n_scans: int = 300) -> float:
    """One sequential stream under the SAME config as `bench_fleet` (plus the
    sequential-only ray-skip flag) — the denominator for an honest batching-
    efficiency ratio.  The plain `bench_sequence` number differs in map
    capacity/window/filters, so fleet-vs-plain overstates batching."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from icp_slam_yolo_tpu.io import scans as scans_io
    from icp_slam_yolo_tpu.slam import pipeline

    cfg = _fleet_bench_cfg()
    cfg = cfg.replace(occupancy=dataclasses.replace(cfg.occupancy, skip_dead_rays=True))
    scans, _, _ = scans_io.load_sequence("/root/reference/Scan_data_1", 1, n_scans + 1, n_max=cfg.n_max)
    scans = jnp.asarray(scans)

    @jax.jit
    def prog(x):
        state, outs = pipeline.run_sequence(x, cfg)
        return state.pose[0] + jnp.sum(outs.rmse * 0)

    base = _measure_fetch_overhead()
    t = _timed_fetch(prog, (scans,), lambda a, k: (a[0].at[:, :, 2].add(1e-4 * k),), repeats=4)
    return len(scans) / max(t - base, 1e-9)


# Physical upper bounds per reading — ~3x each metric's architecture roof
# (VERDICT r4 weak #1: a content-cache artifact once shipped 4.8e10 "ticks/s"
# in BENCH_DETAIL.json).  Rationale per row:
#   * detect @640 bf16 is HBM-bound; the perfect-epilogue-fusion roof is
#     ~12,059 FPS (scripts/detect_roofline.py, docs/roofline_detect.json), so
#     >36k FPS cannot be a real reading.  A fused/detect tick runs a stereo
#     PAIR (2 frames) -> ticks roof ~6k, bound 18k.  Trigger-faithful
#     every-5th amortizes 4 slam-only ticks per detect -> bound 5x higher.
#   * one SLAM scan step is >=2 full-map NN passes + raster; best measured
#     ~4,300 scans/s on one stream -> 20k bound (fleet: 8 streams -> 160k).
#   * a 16x640px train step is ~3 fwd-equivalents of detect-b16 work.
#   * one registration >= ~20 GN iterations over a 500x1500 NN (~120 MFLOP)
#     -> sub-us is impossible even at MXU peak; 1M reg/s bound.
_PLAUSIBILITY_BOUNDS = {
    "icp_registrations_per_sec": 1_000_000.0,
    "sequence_scans_per_sec": 20_000.0,
    "sequence_scans_per_sec_offline_preset": 20_000.0,
    "sequence_scans_per_sec_realtime_preset": 20_000.0,
    "detect_fps_640": 36_000.0,
    "detect_fps_640_b128": 36_000.0,
    "fleet_scans_per_sec": 160_000.0,
    "fused_ticks_per_sec": 18_000.0,
    "fused_ticks_per_sec_triggered": 90_000.0,
    "fused_slam_only_ticks_per_sec": 20_000.0,
    "fused_detect_b2_only_ticks_per_sec": 18_000.0,
    "train_steps_per_sec_b16_640": 1_000.0,
    "train_steps_per_sec_f32_b16_640": 1_000.0,
}


def _guard_implausible(detail: dict) -> dict:
    """Refuse to persist readings beyond their physical bound: move them to
    an ``implausible_readings`` sub-dict (value + bound) and null the metric
    so a cache artifact can never masquerade as a result."""
    bad = {}
    for name, bound in _PLAUSIBILITY_BOUNDS.items():
        v = detail.get(name)
        if isinstance(v, (int, float)) and v > bound:
            print(f"# IMPLAUSIBLE {name}={v:.1f} exceeds bound {bound:.0f} "
                  f"(relay content-cache artifact?) — not persisted", file=sys.stderr)
            bad[name] = {"value": v, "bound": bound}
            detail[name] = None
    if bad:
        detail["implausible_readings"] = bad
    return detail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--all", action="store_true",
        help="also run secondary benchmarks and write BENCH_DETAIL.json",
    )
    args = ap.parse_args()

    src, tgt = _load_pair()
    base = bench_baseline(src, tgt)
    ours = bench_tpu(src, tgt)
    if ours > _PLAUSIBILITY_BOUNDS["icp_registrations_per_sec"]:
        # beyond the physical roof = the relay replayed a cached execution;
        # one retry with a fresh salt, then fail loudly rather than publish
        print(f"# IMPLAUSIBLE primary reading {ours:.1f} reg/s — retrying once", file=sys.stderr)
        ours = bench_tpu(src, tgt)
        if ours > _PLAUSIBILITY_BOUNDS["icp_registrations_per_sec"]:
            raise SystemExit(f"primary benchmark implausible after retry: {ours:.1f} reg/s")
    pair_ms, pair_fixed_ms = bench_single_pair(src, tgt)

    secondary = {
        "single_pair_latency_ms": round(pair_ms, 3),
        "single_pair_fixed50_ms": round(pair_fixed_ms, 3),
    }
    if args.all:
        seq_hz = bench_sequence()
        print(f"# full-sequence SLAM loop: {seq_hz:.1f} scans/s (reference target: 10 Hz)", file=sys.stderr)
        seq_hz_preset = bench_sequence(preset="offline")
        print(f"# full-sequence SLAM loop (shipped OFFLINE preset, rescue on): {seq_hz_preset:.1f} scans/s", file=sys.stderr)
        secondary["sequence_scans_per_sec_offline_preset"] = round(seq_hz_preset, 1)
        seq_hz_rt = bench_sequence(preset="realtime")
        print(f"# full-sequence SLAM loop (shipped REALTIME preset, all filters on): {seq_hz_rt:.1f} scans/s", file=sys.stderr)
        secondary["sequence_scans_per_sec_realtime_preset"] = round(seq_hz_rt, 1)
        fps, gflop_img, tflops, mfu = bench_detect()
        print(f"# YOLO detect: {fps:.1f} FPS @640px bf16 ({gflop_img:.1f} GFLOP/img, "
              f"{tflops:.1f} TFLOP/s achieved, {mfu*100:.1f}% MFU; reference cameras: ~10 Hz)",
              file=sys.stderr)
        secondary["detect_gflop_per_image"] = round(gflop_img, 2)
        # XLA cost analysis cannot see FLOPs inside pallas custom calls, so
        # with the (default) full-Pallas conv path the gflop/MFU readings
        # cover only the XLA remainder of the graph (true model ~8.0
        # GFLOP/img at 640 px, scripts/detect_roofline.py) — FPS is the
        # comparable metric
        secondary["detect_flops_note"] = "gflop/MFU exclude pallas custom-call FLOPs"
        secondary["detect_achieved_tflops"] = round(tflops, 2)
        secondary["detect_mfu"] = round(mfu, 4)
        # throughput regime: small batches leave MXU tiles mostly empty (the
        # batch dim folds into the matmul rows); 128 is the measured knee
        # n_calls=4 left only ~80 ms of signal against the relay's jitter and
        # produced a 5.2-9.7k FPS spread across r5 re-runs; 12 calls puts the
        # chain at ~250 ms and the reading back inside a ~10% band
        fps128, _, tflops128, mfu128 = bench_detect(batch=128, n_calls=12)
        print(f"# YOLO detect throughput (batch 128): {fps128:.1f} FPS "
              f"({tflops128:.1f} TFLOP/s, {mfu128*100:.1f}% MFU)", file=sys.stderr)
        secondary["detect_fps_640_b128"] = round(fps128, 1)
        secondary["detect_mfu_b128"] = round(mfu128, 4)
        fleet = bench_fleet()
        # the matched-single denominator is the jitteriest reading behind the
        # relay (~3,500-4,300 across runs); carry the spread, not a point
        singles = [bench_fleet_matched_single() for _ in range(3)]
        fleet_single = float(np.median(singles))
        secondary["fleet_matched_single_scans_per_sec"] = {
            "point": round(fleet_single, 1),
            "range": [round(min(singles), 1), round(max(singles), 1)],
        }
        print(f"# fleet SLAM (8 robots, vmapped, `fleet` preset flags): {fleet:.1f} scans/s total "
              f"(matched single stream: {fleet_single:.1f} "
              f"[{min(singles):.0f}-{max(singles):.0f}]; batching efficiency "
              f"{fleet / max(fleet_single, 1e-9):.2f}x)", file=sys.stderr)
        fused = bench_fused()
        slam_only = bench_fused(mode="slam_only")
        det_only = bench_fused(mode="detect_only")
        fused_trig = bench_fused(detect_every=5)
        print(f"# fused SLAM+detect tick (scan step + stereo-pair detect): "
              f"{fused:.1f} ticks/s (decomposition: slam-only {slam_only:.0f}, "
              f"detect-b2-only {det_only:.0f}; trigger-faithful every-5th "
              f"{fused_trig:.1f}; reference camera worker: ~10 Hz)", file=sys.stderr)
        secondary["fused_ticks_per_sec"] = round(fused, 1)
        secondary["fused_ticks_per_sec_triggered"] = round(fused_trig, 1)
        secondary["fused_slam_only_ticks_per_sec"] = round(slam_only, 1)
        secondary["fused_detect_b2_only_ticks_per_sec"] = round(det_only, 1)
        import jax.numpy as _jnp

        train_amp = bench_train(compute_dtype=_jnp.bfloat16)
        train_sps = bench_train()
        print(f"# detect train step (batch 16, 640px): {train_amp:.2f} steps/s bf16-AMP "
              f"/ {train_sps:.2f} f32 (reference: ~4.5 steps/s AMP, 8.8 s/epoch)",
              file=sys.stderr)
        secondary["train_steps_per_sec_b16_640"] = round(train_amp, 2)
        secondary["train_steps_per_sec_f32_b16_640"] = round(train_sps, 2)
        print(f"# baseline (NumPy oracle, CPU): {base:.1f} reg/s", file=sys.stderr)
        print(f"# single-pair (B=1) latency: {pair_ms:.3f} ms converged / {pair_fixed_ms:.3f} ms fixed-50", file=sys.stderr)
        secondary.update(
            sequence_scans_per_sec=round(seq_hz, 1),
            detect_fps_640=round(fps, 1),
            fleet_scans_per_sec=round(fleet, 1),
            baseline_cpu_reg_per_sec=round(base, 1),
        )
        import os

        detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
        detail = _guard_implausible({"icp_registrations_per_sec": round(ours, 1), **secondary})
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=2)
        print(f"# wrote {detail_path}", file=sys.stderr)

    # ONE JSON line (driver contract); secondary numbers ride along as a
    # sub-object so BENCH_r{N}.json files are comparable round over round
    print(
        json.dumps(
            {
                "metric": "icp_registrations_per_sec",
                "value": round(ours, 1),
                "unit": "reg/s",
                "vs_baseline": round(ours / base, 1),
                "secondary": secondary,
                # round 1 measured dispatch rate (block_until_ready does not
                # wait for device execution behind the async TPU relay); from
                # round 2 on, numbers are true device throughput via in-graph
                # chained calls + host fetch.  NOT comparable to BENCH_r01.
                "protocol": "in-graph-chain-v2",
            }
        )
    )


if __name__ == "__main__":
    main()
