"""Multi-host scaling: process initialisation and host-spanning meshes.

The reference's only cross-machine comm is Wi-Fi sockets between ESP32 boards
(SURVEY.md section 2.6).  For TPU pods, scaling follows the standard JAX
multi-controller model: one process per host, `jax.distributed.initialize`,
then a single global mesh whose data (fleet) axis spans hosts — batches of
robot streams shard across all chips, intra-host collectives ride ICI and
inter-host traffic rides DCN.  On a single host everything below is a no-op
passthrough, so the same code runs on 1 chip or a pod.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialise multi-host JAX when configured; no-op on a single host.

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    arguments are not given (standard pod launcher envs).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def global_fleet_mesh(axis_name: str = "data") -> Mesh:
    """A 1-D mesh over every chip in the job (all hosts).  The fleet batch
    axis shards over it; `jax.make_array_from_process_local_data` feeds each
    host its own shard of robot streams."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def process_local_batch_size(global_batch: int) -> int:
    """Per-host share of a global fleet batch."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} processes")
    return global_batch // n
