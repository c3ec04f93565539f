"""Kabsch solves: recover known transforms; SVD path matches the reference algorithm."""

import numpy as np
import jax.numpy as jnp

from icp_slam_yolo_tpu.ops.kabsch import best_fit_se2, best_fit_transform_svd


def _rot(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]])


def test_best_fit_se2_exact(rng):
    src = rng.normal(size=(100, 2)) * 2000
    theta, t = 0.42, np.array([300.0, -150.0])
    dst = src @ _rot(theta).T + t
    th, tt = best_fit_se2(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32), jnp.ones(100))
    assert abs(float(th) - theta) < 1e-4
    np.testing.assert_allclose(np.asarray(tt), t, atol=0.5)


def test_best_fit_se2_weighted(rng):
    src = rng.normal(size=(64, 2)) * 1000
    theta, t = -0.9, np.array([-40.0, 260.0])
    dst = src @ _rot(theta).T + t
    dst[32:] += rng.normal(size=(32, 2)) * 5000  # corrupt half, weight them out
    w = jnp.asarray(np.concatenate([np.ones(32), np.zeros(32)]))
    th, tt = best_fit_se2(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32), w)
    assert abs(float(th) - theta) < 1e-4
    np.testing.assert_allclose(np.asarray(tt), t, atol=0.5)


def test_best_fit_se2_zero_weights_identity():
    src = jnp.zeros((10, 2))
    th, tt = best_fit_se2(src, src, jnp.zeros(10))
    assert float(th) == 0.0
    np.testing.assert_array_equal(np.asarray(tt), np.zeros(2))


def test_svd_matches_se2(rng):
    """3-D SVD Kabsch (reference `icp.py:5-26` algorithm) agrees with the 2-D
    closed form on planar data."""
    src = rng.normal(size=(80, 2)) * 1500
    theta, t = 1.2, np.array([500.0, 100.0])
    dst = src @ _rot(theta).T + t
    r, tt = best_fit_transform_svd(jnp.asarray(src, jnp.float32) * 1e-3, jnp.asarray(dst, jnp.float32) * 1e-3)
    np.testing.assert_allclose(np.asarray(r), _rot(theta), atol=1e-4)
    np.testing.assert_allclose(np.asarray(tt) * 1e3, t, atol=0.5)


def test_svd_reflection_fix(rng):
    """Degenerate/noisy correspondences must still return a proper rotation."""
    src = rng.normal(size=(30, 2))
    dst = rng.normal(size=(30, 2))
    r, _ = best_fit_transform_svd(jnp.asarray(src, jnp.float32), jnp.asarray(dst, jnp.float32))
    assert float(jnp.linalg.det(r)) > 0.99
