"""A/B: XLA conv emitter vs Pallas fused conv+bias+SiLU on the top detect stages.

VERDICT r4 #6: the ~1.8x gap between measured detect throughput and the
perfect-fusion roofline is *argued* (docs/PERF.md fusion probe: XLA runs SiLU
as a separate pass after every conv and never fuses elementwise work into the
conv emitter) but not *measured*.  This script measures it, stage by stage, on
the three largest speed-of-light units of the BN-folded detect forward
(docs/roofline_detect.json, b8 f32 accounting):

  stage     op                 in -> out                      SoL share
  stem      3x3 s2  conv+SiLU  (B,640,640, 3)->(B,320,320,16)  56 us
  down2     3x3 s2  conv+SiLU  (B,320,320,16)->(B,160,160,32)  48 us
  c2f2_cv1  1x1 s1  conv+SiLU  (B,160,160,32)->(B,160,160,32)  32 us

Protocol: in-graph chained calls (the bench.py `_timed_fetch` protocol — the
output of call k feeds call k+1 so the relay cannot content-cache repeats),
marginal cost = (t_N - t_0) / n_calls, b8 and b128, bf16 activations.

Also measures the two-stage fusion XLA cannot express at all: stem+down2 as
ONE Pallas kernel whose 26 MB (b8 bf16) intermediate never leaves VMEM.

Writes docs/conv_fused_ab.json; PERF.md records the verdict either way.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import time

import numpy as np

# stage name -> (C_in, C_out, kernel, stride, H_in at 640 px)
STAGES = {
    "stem": (3, 16, 3, 2, 640),
    "down2": (16, 32, 3, 2, 320),
    "c2f2_cv1": (32, 32, 1, 1, 160),
    # representative 3x3 s1 bottleneck shapes (32 such sites, ~32% of SoL):
    "c2f2_b3x3": (16, 16, 3, 1, 160),
    "c2f4_b3x3": (32, 32, 3, 1, 80),
    "c2f6_b3x3": (64, 64, 3, 1, 40),
    "c2f4_cv1": (32, 32, 1, 1, 80),
}

# v5e single-chip roofs (docs/PERF.md fusion probe: 838 GB/s measured peak,
# ~20-40 us fixed floor per kernel at small sizes)
HBM_GBPS = 838.0
KERNEL_FLOOR_US = 20.0


def _timed_chain(make_prog, n_calls: int, repeats: int = 5) -> float:
    """Marginal seconds per call: (t_N - t_0) via in-graph chaining."""
    import jax
    import jax.numpy as jnp

    p0, x0 = make_prog(0)
    pN, xN = make_prog(n_calls)
    salt = 1.0 + int.from_bytes(os.urandom(4), "little") % 997 / 997.0

    def run(prog, x):
        float(prog(x))  # compile+warm
        ts = []
        for k in range(repeats):
            xk = x + jnp.bfloat16((k + 1) * salt * 1e-3)
            t0 = time.perf_counter()
            float(prog(xk))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts[1:]))

    return max(run(pN, xN) - run(p0, x0), 1e-9) / n_calls


def calls_for(name: str, batch: int, floor_us: float = 80_000.0) -> int:
    """Scale chain length so the N-call program runs >=~80 ms of expected
    stage work — the relay's ~1-3 ms dispatch jitter must be <<1 us/call
    (n=32 at a 20 us SoL stage left the b8/b128 readings under the noise
    floor: 0.0 us entries in the first capture)."""
    return int(min(2000, max(64, floor_us / sol_us(name, batch))))


def make_xla_stage(name: str, batch: int):
    """jit(conv + bias + SiLU) exactly as the BN-folded Detector runs it."""
    import jax
    import jax.numpy as jnp

    cin, cout, k, s, h = STAGES[name]
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.bfloat16)

    def stage(x):
        y = jax.lax.conv_general_dilated(
            x, w, (s, s), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return jax.nn.silu(y + b.astype(jnp.float32)).astype(jnp.bfloat16)

    def make_prog(n_calls):
        x = jnp.asarray(rng.standard_normal((batch, h, h, cin)), jnp.bfloat16)

        @jax.jit
        def prog(x):
            def body(i, acc):
                y = stage(x + acc * jnp.bfloat16(1e-6))
                return jnp.mean(y).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, n_calls, body, jnp.bfloat16(0.0))

        return prog, x

    return stage, make_prog


def sol_us(name: str, batch: int) -> float:
    """HBM-bound speed-of-light for the fused stage (read in + write out, bf16)."""
    cin, cout, k, s, h = STAGES[name]
    bytes_ = batch * h * h * cin * 2 + batch * (h // s) ** 2 * cout * 2
    return max(bytes_ / HBM_GBPS / 1e3, KERNEL_FLOOR_US)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,128")
    ap.add_argument("--n-calls", type=int, default=0,
                    help="0 = auto-scale per stage (see calls_for)")
    ap.add_argument("--pallas", action="store_true", help="also run the Pallas kernels")
    args = ap.parse_args()

    global jnp
    import jax.numpy as jnp

    out = {"protocol": f"chained marginal cost, n_calls={args.n_calls}, bf16"}
    for batch in [int(b) for b in args.batches.split(",")]:
        res = {}
        for name in STAGES:
            n = args.n_calls or calls_for(name, batch)
            _, make_prog = make_xla_stage(name, batch)
            t = _timed_chain(make_prog, n)
            res[name] = {
                "xla_us": round(t * 1e6, 1),
                "sol_us": round(sol_us(name, batch), 1),
                "n_calls": n,
            }
            print(f"b{batch} {name}: XLA {t*1e6:.1f} us (SoL {sol_us(name, batch):.1f}, n={n})",
                  flush=True)
        if args.pallas:
            from icp_slam_yolo_tpu.ops.pallas import conv_fused

            for name in STAGES:
                mk = conv_fused.make_bench_stage(name, STAGES[name], batch)
                if mk is None:
                    continue
                n = args.n_calls or calls_for(name, batch)
                t = _timed_chain(mk, n)
                res[name]["pallas_us"] = round(t * 1e6, 1)
                res[name]["speedup"] = round(res[name]["xla_us"] / (t * 1e6), 2)
                print(f"b{batch} {name}: PALLAS {t*1e6:.1f} us "
                      f"({res[name]['speedup']}x vs XLA)", flush=True)
        out[f"b{batch}"] = res

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "conv_fused_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
