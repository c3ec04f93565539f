"""icp_slam_yolo_tpu — a TPU-native SLAM + perception framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
``DucVuUET04/ICP_SLAM-YOLO`` reference project: 2-D LiDAR ICP SLAM with an
occupancy-grid map, YOLO pallet perception with stereo 3-D pose, an offline
replayer, an HTTP serving surface, a labeling/dataset toolchain, and
``vmap``/``shard_map`` fleet batching across TPU meshes.

Everything in the per-scan hot path is fixed-shape, masked, compiled JAX:
scans are padded to ``n_max`` points with validity masks, the global map is a
fixed-capacity masked buffer, and the occupancy grid is a dense float32
probability image. The full scan->pose->map pipeline runs as one jitted
``lax.scan`` program with zero per-scan host round-trips.

Reference layer map: SURVEY.md section 1; component inventory: section 2.
"""

from icp_slam_yolo_tpu.config import (
    GateConfig,
    IcpConfig,
    MapConfig,
    OccupancyConfig,
    SlamConfig,
    OFFLINE_CONFIG,
    REALTIME_CONFIG,
)
from icp_slam_yolo_tpu.core.registration import RegistrationResult, gicp, icp, register
from icp_slam_yolo_tpu.slam.pipeline import SlamState, init_state, make_step, run_sequence
from icp_slam_yolo_tpu.slam.api import Slam

__version__ = "0.1.0"

__all__ = [
    "GateConfig",
    "IcpConfig",
    "MapConfig",
    "OccupancyConfig",
    "SlamConfig",
    "OFFLINE_CONFIG",
    "REALTIME_CONFIG",
    "RegistrationResult",
    "register",
    "icp",
    "gicp",
    "SlamState",
    "init_state",
    "make_step",
    "run_sequence",
    "Slam",
    "__version__",
]
