"""Correctness of the fused conv+bias+SiLU Pallas kernels vs the XLA op.

Runs in interpret mode on the CPU test backend; the TPU-compiled path is
exercised by scripts/conv_fused_ab.py (which also A/Bs performance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icp_slam_yolo_tpu.ops.pallas import conv_fused


def _xla_ref(x, w, b):
    y = jnp.einsum("bhwc,co->bhwo", x.astype(jnp.float32), w.astype(jnp.float32))
    return jax.nn.silu(y + b.astype(jnp.float32))


@pytest.mark.parametrize("cin,cout", [(32, 32), (64, 32), (16, 48)])
def test_conv1x1_silu_matches_xla(cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    got = conv_fused.conv1x1_silu(x, w, b, tile_m=128, interpret=True)
    want = _xla_ref(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_conv1x1_silu_bf16_close():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 32, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((32, 32)) * 0.1, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((32,)) * 0.1, jnp.bfloat16)
    got = np.asarray(conv_fused.conv1x1_silu(x, w, b, tile_m=64, interpret=True),
                     np.float32)
    want = np.asarray(_xla_ref(x, w, b), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


def test_conv1x1_no_act_matches_linear():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 8, 32, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)) * 0.1, jnp.float32)
    got = conv_fused.conv1x1_silu(x, w, b, tile_m=64, interpret=True, act=False)
    want = jnp.einsum("bhwc,co->bhwo", x, w) + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def _xla_conv3s2(x, w, b):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.silu(y + b.astype(jnp.float32))


@pytest.mark.parametrize("cin,cout,hw", [(3, 16, 64), (16, 32, 32), (64, 128, 16)])
def test_conv3x3s2_silu_matches_xla(cin, cout, hw):
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    got = conv_fused.conv3x3s2_silu(x, w, b, tile_h=8, interpret=True)
    want = _xla_conv3s2(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_conv3x3s2_single_tile():
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 8, 64, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 16)) * 0.1, jnp.float32)
    b = jnp.zeros((16,), jnp.float32)
    got = conv_fused.conv3x3s2_silu(x, w, b, tile_h=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla_conv3s2(x, w, b)),
                               rtol=2e-4, atol=2e-4)


def _xla_conv3(x, w, b):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.silu(y + b.astype(jnp.float32))


@pytest.mark.parametrize("cin,cout,hw", [(16, 16, 32), (64, 64, 16), (128, 128, 8)])
def test_conv3x3_silu_matches_xla(cin, cout, hw):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
    got = conv_fused.conv3x3_silu(x, w, b, tile_h=8, interpret=True)
    want = _xla_conv3(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_conv3x3_silu_single_tile():
    # one row-tile: both y-halos are the zero edge case
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 16)) * 0.1, jnp.float32)
    b = jnp.zeros((16,), jnp.float32)
    got = conv_fused.conv3x3_silu(x, w, b, tile_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_xla_conv3(x, w, b)),
                               rtol=2e-4, atol=2e-4)


def test_interceptor_mini_module_swap_and_fallback():
    """Interceptor unit semantics on a 4-block module, without the ~30 s
    full-YOLO init: supported 1x1 and 3x3-s1 sites swap to the fused kernels,
    stride-2 and throughput-batch sites fall through, outputs match the stock
    forward exactly."""
    import flax.linen as nn

    from icp_slam_yolo_tpu.models.yolo import ConvBnAct
    from icp_slam_yolo_tpu.ops.pallas import conv_fused
    from icp_slam_yolo_tpu.ops.pallas.conv_fused import pallas_cba_interceptor

    class Mini(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = ConvBnAct(16, 3, 2, folded=True)(x, train)    # stride-2 kernel
            x = ConvBnAct(16, 3, 1, folded=True)(x, train)    # 3x3-s1 kernel
            x = ConvBnAct(32, 1, 1, folded=True)(x, train)    # 1x1 kernel
            # unfolded CBA: falls through, but its INNER conv still swaps to
            # the no-act 1x1 kernel (full-pallas path: no XLA conv touches a
            # pallas boundary)
            return ConvBnAct(32, 1, 1, folded=False)(x, train)

    m = Mini()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 160, 160, 3)), jnp.float32)
    v = m.init(jax.random.key(0), x)
    o0 = m.apply(v, x, train=False)

    calls = []
    orig1, orig3 = conv_fused.conv1x1_silu, conv_fused.conv3x3_silu
    orig_s2 = conv_fused.conv3x3s2_silu
    conv_fused.conv1x1_silu = lambda *a, **k: calls.append(
        "1x1" if k.get("act", True) else "1x1na") or orig1(*a, **k)
    conv_fused.conv3x3_silu = lambda *a, **k: calls.append("3x3") or orig3(*a, **k)
    conv_fused.conv3x3s2_silu = lambda *a, **k: calls.append("s2") or orig_s2(*a, **k)
    try:
        with nn.intercept_methods(pallas_cba_interceptor):
            o1 = m.apply(v, x, train=False)
        assert sorted(calls) == ["1x1", "1x1na", "3x3", "s2"], calls
        calls.clear()
        xb = jnp.concatenate([x] * 20, axis=0)  # batch 40 > regime gate (32)
        with nn.intercept_methods(pallas_cba_interceptor):
            ob = m.apply(v, xb, train=False)
        assert calls == [], calls  # throughput regime: all-XLA
    finally:
        conv_fused.conv1x1_silu, conv_fused.conv3x3_silu = orig1, orig3
        conv_fused.conv3x3s2_silu = orig_s2
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o0), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ob[:2]), np.asarray(o0), atol=2e-4, rtol=1e-4)


@pytest.mark.slow  # ~30-50 s of full-YOLO init each; the mini-module test
# above covers the interceptor logic and the TPU checkpoint-family check
# covers the real model (docs/PERF.md r5)
@pytest.mark.parametrize("family", ["v8", "v12"])
def test_interceptor_preserves_model_outputs(family):
    """A folded YOLO forward with `pallas_cba_interceptor` (Detector's
    `pallas_convs=True` path) must equal the stock flax forward: every
    supported 1x1/3x3-s1 ConvBnAct swaps to the fused kernel, everything else
    falls through untouched."""
    import flax.linen as nn

    from icp_slam_yolo_tpu.models.yolo import YOLO, fold_batchnorm
    from icp_slam_yolo_tpu.ops.pallas.conv_fused import pallas_cba_interceptor

    m = YOLO(num_classes=1, family=family, fold_bn=True, compute_dtype=jnp.float32)
    m0 = YOLO(num_classes=1, family=family, compute_dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    v = m0.init(jax.random.key(0), x)
    fp, fbs = fold_batchnorm(v["params"], v["batch_stats"])
    vars_ = {"params": fp, "batch_stats": fbs}
    o0 = m.apply(vars_, x, train=False)
    with nn.intercept_methods(pallas_cba_interceptor):
        o1 = m.apply(vars_, x, train=False)
    for a, b in zip(jax.tree.leaves(o0), jax.tree.leaves(o1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)


def test_pack_group():
    assert conv_fused._pack_group(32, 32) == 4
    assert conv_fused._pack_group(16, 32) == 8
    assert conv_fused._pack_group(128, 128) == 1
    assert conv_fused._pack_group(48, 32) == 8  # lcm(8/3... -> 8)
