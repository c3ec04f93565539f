"""A/B: whole-C2f megakernel vs the XLA op-by-op block (docs/PERF.md r5).

The per-site conv fusion verdict said only whole-block fusion can win (2
pallas<->XLA boundaries instead of ~6, four intermediates never touch HBM).
This measures that claim on the two large-spatial v8n C2f blocks at the
latency-regime batches, same chained protocol as conv_fused_ab.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np

# name -> (cin, c, feat, H)
BLOCKS = {
    "c2f_2": (32, 16, 32, 160),
    "c2f_4": (64, 32, 64, 80),
}


def make_progs(name: str, batch: int, which: str):
    import jax
    import jax.numpy as jnp

    from icp_slam_yolo_tpu.ops.pallas import c2f_fused as cf

    cin, c, feat, h = BLOCKS[name]
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.bfloat16)
    ps = (mk(cin, 2 * c), mk(2 * c), mk(3, 3, c, c), mk(c),
          mk(3, 3, c, c), mk(c), mk(3 * c, feat), mk(feat))

    def xla_block(x):
        w1, b1, wm1, bm1, wm2, bm2, w2, b2 = ps
        y = jax.nn.silu(jnp.einsum("bhwc,co->bhwo", x, w1) + b1)
        a, b = y[..., :c], y[..., c:]
        conv3 = lambda t, w, bb: jax.nn.silu(jax.lax.conv_general_dilated(
            t, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16) + bb)
        t1 = conv3(b, wm1, bm1)
        t2 = conv3(t1, wm2, bm2)
        cc = jnp.concatenate([a, b, b + t2], axis=-1)
        return jax.nn.silu(jnp.einsum("bhwc,co->bhwo", cc, w2) + b2)

    op = (lambda x: cf.c2f_fused(x, *ps)) if which == "pallas" else xla_block

    def make_prog(n_calls):
        x = jnp.asarray(rng.standard_normal((batch, h, h, cin)), jnp.bfloat16)

        @jax.jit
        def prog(x):
            def body(i, acc):
                y = op(x + acc * jnp.bfloat16(1e-6))
                return jnp.mean(y).astype(jnp.bfloat16)
            return jax.lax.fori_loop(0, n_calls, body, jnp.bfloat16(0.0))

        return prog, x

    return make_prog


def main():
    """One (batch, block, impl) measurement per process — the TPU relay
    occasionally wedges long-lived processes, so the sweep is shell-driven
    (`for b in 2 8; for blk in ...; timeout ... --batch b --block blk --impl x`)
    and each result appends to docs/c2f_fused_ab.jsonl."""
    import argparse

    from conv_fused_ab import _timed_chain

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, required=True)
    ap.add_argument("--block", required=True)
    ap.add_argument("--impl", choices=["xla", "pallas"], required=True)
    ap.add_argument("--n-calls", type=int, default=0)
    args = ap.parse_args()

    n = args.n_calls or (1000 if args.batch == 2 else 400)
    t = _timed_chain(make_progs(args.block, args.batch, args.impl), n)
    rec = {"batch": args.batch, "block": args.block, "impl": args.impl,
           "us": round(t * 1e6, 1), "n_calls": n}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "c2f_fused_ab.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
