"""Test env: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware (SURVEY.md section 4: multi-chip tests via the XLA
host-device-count flag).  Must run before the first jax import."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# jax may already be imported by an interpreter-startup hook with the TPU
# platform pre-selected; the config update still wins as long as no backend
# has been initialised yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from icp_slam_yolo_tpu.io import scans as scans_io  # noqa: E402

REFERENCE_SCANS = "/root/reference/Scan_data_1"
# the dataset mixes two name schemes: Scan_data_{1..219}.npy, scan_data_{220..}.npy


def _scan(i: int) -> np.ndarray:
    paths = scans_io.sequence_paths(REFERENCE_SCANS, i, i + 1)
    if not paths:
        pytest.skip("reference scan data unavailable")
    return np.load(paths[0])


@pytest.fixture(scope="session")
def scan_pair():
    """The reference's own pairwise-ICP demo pair (`ds.py:80-81`: scans 350/355)."""
    return _scan(350), _scan(355)


@pytest.fixture(scope="session")
def scan_sequence():
    """First 60 scans of Scan_data_1 (raw polar)."""
    if not os.path.isdir(REFERENCE_SCANS):
        pytest.skip("reference scan data unavailable")
    paths = scans_io.sequence_paths(REFERENCE_SCANS, 1, 61)
    return [np.load(p) for p in paths]


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    return np.random.default_rng(42)
