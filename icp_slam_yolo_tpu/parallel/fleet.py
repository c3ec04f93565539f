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
    """Batched ``step``: ``(states, scans(B, n, 3)[, tick]) -> (states, outs, fleet_stats)``.

    ``fleet_stats`` (mean RMSE and accept-rate over the fleet) force a
    cross-chip all-reduce so the multi-device path exercises real collectives.

    ``tick`` (optional scalar) is the fleet-uniform maintenance counter — pass
    a running sequence index to keep the realtime prune/downsample cadence a
    real branch under vmap (see `pipeline.make_step`); streaming callers that
    omit it fall back to the per-lane counter (select semantics: correct,
    slower).
    """
    step = pipeline.make_step(cfg)

    def fleet_step(states, scans, tick=None):
        states, outs = jax.vmap(lambda s, x: step(s, x, tick))(states, scans)
        finite = jnp.isfinite(outs.rmse)
        mean_rmse = jnp.sum(jnp.where(finite, outs.rmse, 0.0)) / jnp.maximum(jnp.sum(finite), 1)
        stats = {"mean_rmse": mean_rmse, "accept_rate": jnp.mean(outs.accepted.astype(jnp.float32))}
        return states, outs, stats

    return fleet_step


@partial(jax.jit, static_argnames=("cfg",))
def fleet_run_sequence(scans: jnp.ndarray, cfg: SlamConfig = SlamConfig()):
    """Replay ``(B, T, n_max, 3)`` scan stacks for B robots in one program.

    The scan is the OUTER loop and ``vmap`` the inner transform (instead of
    vmapping `run_sequence` whole) so the step sees the sequence index as an
    unbatched scalar: realtime maintenance then stays a real every-10-steps
    branch instead of per-step select work (the single biggest cost of the
    vmapped realtime step).  Maintenance cadence is therefore fleet-uniform —
    identical to per-lane sequential replay whenever no lane skips a scan for
    lack of gated points.
    """
    states = jax.vmap(lambda s: pipeline.init_state(s, cfg))(scans[:, 0])
    step = pipeline.make_step(cfg)
    xs = jnp.swapaxes(scans[:, 1:], 0, 1)  # (T-1, B, n_max, 3)

    def body(carry, scans_t):
        states, t = carry
        states, outs = jax.vmap(lambda s, x: step(s, x, t))(states, scans_t)
        return (states, t + 1), outs

    (final, _), outs = jax.lax.scan(body, (states, jnp.int32(0)), xs)
    outs = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), outs)  # back to (B, T-1, ...)
    return final, outs


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
