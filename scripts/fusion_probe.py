"""Clean conv-epilogue fusion probe: the chain stabilizer is a fusable clip
(no reduction), so per-iter deltas isolate the epilogue cost.  Also calibrates
streaming HBM bandwidth at three sizes."""
import sys
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo")
from bench import _measure_fetch_overhead, _timed_fetch  # noqa: E402

B, H, W, C = 8, 80, 80, 64
K = 200

kern = jnp.asarray(
    np.random.default_rng(0).normal(0, 1 / np.sqrt(9 * C), (3, 3, C, C)), jnp.bfloat16
)


def make(mode):
    def body(i, x):
        y = lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16,
        )
        if mode >= 1:
            y = y * jax.nn.sigmoid(y)
        if mode >= 2:
            y = jnp.tanh(y * 1.001)
        return jnp.clip(y, -8.0, 8.0)

    @jax.jit
    def prog(x):
        return jnp.sum(lax.fori_loop(0, K, body, x).astype(jnp.float32))

    return prog


base = _measure_fetch_overhead()
print(f"fetch overhead: {base*1e3:.2f} ms")
x0 = jnp.asarray(np.random.default_rng(1).normal(0, 1, (B, H, W, C)), jnp.bfloat16)

for mode, name in [(0, "conv+clip"), (1, "conv+clip+silu"), (2, "conv+clip+silu+tanh")]:
    prog = make(mode)
    t = _timed_fetch(prog, (x0,), lambda a, k: (a[0] + jnp.bfloat16(1e-3) * k,), repeats=4)
    per = (t - base) / K
    print(f"{name:24s}: {per*1e6:8.1f} us/iter")

for mb in (8, 32, 128):
    N = mb * 1024 * 1024 // 2
    big = jnp.zeros((N,), jnp.bfloat16)

    def mkcopy():
        @jax.jit
        def copy_prog(x):
            def body(i, x):
                return x + jnp.bfloat16(1.0)
            return lax.fori_loop(0, 50, body, x)[0].astype(jnp.float32)
        return copy_prog

    t = _timed_fetch(mkcopy(), (big,), lambda a, k: (a[0] + jnp.bfloat16(k),), repeats=4)
    per = (t - base) / 50
    bw = 2 * N * 2 / per / 1e9
    print(f"HBM stream {mb:4d} MB: {per*1e3:7.3f} ms/pass -> {bw:5.0f} GB/s")
