"""Correctness of the whole-C2f megakernel vs the XLA op-by-op forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_slam_yolo_tpu.ops.pallas import c2f_fused as cf


def _conv3(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.silu(y + b)


def _ref(x, w1, b1, wm1, bm1, wm2, bm2, w2, b2):
    c = w1.shape[1] // 2
    y = jax.nn.silu(jnp.einsum("bhwc,co->bhwo", x, w1) + b1)
    a, b = y[..., :c], y[..., c:]
    t1 = _conv3(b, wm1, bm1)
    t2 = _conv3(t1, wm2, bm2)
    p = b + t2
    cc = jnp.concatenate([a, b, p], axis=-1)
    return jax.nn.silu(jnp.einsum("bhwc,co->bhwo", cc, w2) + b2)


def _params(rng, cin, c, feat):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    return (mk(cin, 2 * c), mk(2 * c), mk(3, 3, c, c), mk(c),
            mk(3, 3, c, c), mk(c), mk(3 * c, feat), mk(feat))


@pytest.mark.parametrize("cin,c,feat,hw", [(32, 16, 32, 32), (64, 32, 64, 16)])
def test_c2f_fused_matches_xla(cin, c, feat, hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)), jnp.float32)
    ps = _params(rng, cin, c, feat)
    got = cf.c2f_fused(x, *ps, tile_h=8, interpret=True)
    want = _ref(x, *ps)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


def test_c2f_fused_single_tile_and_edges():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 32)), jnp.float32)
    ps = _params(rng, 32, 16, 32)
    got = cf.c2f_fused(x, *ps, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref(x, *ps)),
                               rtol=3e-4, atol=3e-4)


def _ref_noshort(x, w1, b1, wm1, bm1, wm2, bm2, w2, b2):
    c = w1.shape[1] // 2
    y = jax.nn.silu(jnp.einsum("bhwc,co->bhwo", x, w1) + b1)
    a, b = y[..., :c], y[..., c:]
    t2 = _conv3(_conv3(b, wm1, bm1), wm2, bm2)
    return jax.nn.silu(
        jnp.einsum("bhwc,co->bhwo", jnp.concatenate([a, b, t2], -1), w2) + b2)


def test_c2f_fused_no_shortcut_neck_variant():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 48)), jnp.float32)
    ps = _params(rng, 48, 16, 32)
    got = cf.c2f_fused(x, *ps, tile_h=8, interpret=True, shortcut=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref_noshort(x, *ps)),
                               rtol=3e-4, atol=3e-4)


def test_c2f_interceptor_swaps_n1_blocks_only():
    import flax.linen as nn

    from icp_slam_yolo_tpu.models.yolo import C2f

    class Two(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = C2f(32, n=1, shortcut=True, folded=True)(x, train)
            return C2f(32, n=2, shortcut=True, folded=True)(x, train)

    m = Two()
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (2, 16, 16, 32)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    o0 = m.apply(v, x, train=False)
    calls = []
    orig = cf.c2f_fused
    cf.c2f_fused = lambda *a, **k: calls.append(k.get("shortcut")) or orig(*a, **k)
    try:
        with nn.intercept_methods(cf.c2f_interceptor):
            o1 = m.apply(v, x, train=False)
    finally:
        cf.c2f_fused = orig
    assert calls == [True]  # only the n=1 block swapped
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), atol=3e-4, rtol=3e-4)
