"""Pallas NN kernel (interpreter mode on CPU) vs the XLA path and SciPy."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial import KDTree

from icp_slam_yolo_tpu.ops.pallas.nn_kernel import nn_argmin_pallas


def test_pallas_nn_matches_kdtree(rng):
    src = rng.normal(size=(256, 2)).astype(np.float32) * 3000
    tgt = rng.normal(size=(512, 2)).astype(np.float32) * 3000
    tv = np.ones(512, bool)
    d2, idx = nn_argmin_pallas(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(tv), interpret=True)
    ref_d, ref_i = KDTree(tgt).query(src)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), ref_d, rtol=1e-5)


def test_pallas_nn_multi_tile(rng):
    """Target larger than one tile exercises the running-min loop."""
    src = rng.normal(size=(64, 2)).astype(np.float32) * 1000
    tgt = rng.normal(size=(4096, 2)).astype(np.float32) * 1000
    tv = np.ones(4096, bool)
    d2, idx = nn_argmin_pallas(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(tv), interpret=True)
    ref_d, ref_i = KDTree(tgt).query(src)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), ref_d, rtol=1e-5)


def test_pallas_nn_respects_mask(rng):
    src = np.zeros((8, 2), np.float32)
    tgt = rng.normal(size=(128, 2)).astype(np.float32) * 100
    tv = np.zeros(128, bool)
    tv[7] = True  # only one valid target
    d2, idx = nn_argmin_pallas(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(tv), interpret=True)
    assert all(np.asarray(idx) == 7)
    np.testing.assert_allclose(np.asarray(d2), (tgt[7] ** 2).sum(), rtol=1e-5)
