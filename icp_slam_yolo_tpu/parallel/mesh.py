"""Device-mesh helpers.

The reference's entire "distribution" surface is threads + one camera process +
Wi-Fi/UART sockets (SURVEY.md section 2.6).  The TPU-native replacement is a
``jax.sharding.Mesh``: fleet batching (many robots / scan streams) shards the
batch axis across chips (pure data parallelism — the only parallelism this
workload needs; TP/PP/SP/EP are N/A for a 2-D geometry pipeline and are
documented as such), and model training shards batch + optionally channels.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names: tuple[str, ...] = ("data",)) -> Mesh:
    """1-D (or reshaped) mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    devs = np.asarray(devs[:n])
    if len(axis_names) > 1:
        # fold into a near-square grid for ('data', 'model')-style meshes
        a = int(np.gcd(n, int(np.sqrt(n)) or 1)) or 1
        while n % a:
            a -= 1
        devs = devs.reshape(a, n // a)
    return Mesh(devs, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (the fleet/batch axis) across ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
