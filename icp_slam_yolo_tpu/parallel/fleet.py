"""Fleet-batched SLAM: many robots / scan streams across a TPU mesh.

The reference runs one robot per script invocation; here a whole fleet is one
SPMD program: ``vmap`` adds the robot axis, the mesh shards it across chips
(BASELINE.json config 5: "batched multi-sequence / multi-robot SLAM ... over 64
scan streams").  Cross-robot reductions (fleet health statistics) ride ICI
collectives that XLA inserts from the sharding annotations — no hand-written
NCCL/socket plumbing like the reference's ESP32/Wi-Fi stack.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.config import SlamConfig
from icp_slam_yolo_tpu.parallel.mesh import batch_sharding, make_mesh
from icp_slam_yolo_tpu.slam import pipeline


def fleet_init(first_scans: jnp.ndarray, cfg: SlamConfig):
    """``(B, n_max, 3)`` first scans -> batched SlamState."""
    return jax.vmap(lambda s: pipeline.init_state(s, cfg))(first_scans)


def make_fleet_step(cfg: SlamConfig):
    """Batched ``step``: ``(states, scans(B, n, 3)) -> (states, outs, fleet_stats)``.

    ``fleet_stats`` (mean RMSE and accept-rate over the fleet) force a
    cross-chip all-reduce so the multi-device path exercises real collectives.
    """
    step = pipeline.make_step(cfg)

    def fleet_step(states, scans):
        states, outs = jax.vmap(step)(states, scans)
        finite = jnp.isfinite(outs.rmse)
        mean_rmse = jnp.sum(jnp.where(finite, outs.rmse, 0.0)) / jnp.maximum(jnp.sum(finite), 1)
        stats = {"mean_rmse": mean_rmse, "accept_rate": jnp.mean(outs.accepted.astype(jnp.float32))}
        return states, outs, stats

    return fleet_step


@partial(jax.jit, static_argnames=("cfg",))
def fleet_run_sequence(scans: jnp.ndarray, cfg: SlamConfig = SlamConfig()):
    """Replay ``(B, T, n_max, 3)`` scan stacks for B robots in one program."""
    return jax.vmap(lambda s: pipeline.run_sequence(s, cfg))(scans)


def fleet_run_sharded(scans, cfg: SlamConfig, mesh=None):
    """Shard the fleet axis over the mesh and replay.  ``B`` must divide by the
    mesh's data-axis size.  Returns ``(final_states, outputs)`` with outputs
    still sharded on the batch axis.
    """
    mesh = mesh or make_mesh()
    sharding = batch_sharding(mesh)
    scans = jax.device_put(jnp.asarray(scans), sharding)
    fn = jax.jit(partial(fleet_run_sequence, cfg=cfg), in_shardings=sharding)
    return fn(scans)
