"""Collaborative shared-map SLAM: a robot fleet building ONE map over ICI.

The embarrassingly-parallel fleet (`parallel/fleet.py`) gives every robot its
own map.  This module is the collective-communication design SURVEY.md
section 2.6 anticipates ("psum-style collectives only if a future shared
global map is sharded"): the robot axis is sharded over the mesh with
`shard_map`, the global map + occupancy grid are REPLICATED, and each step
merges every robot's contribution with XLA collectives riding ICI:

* **Occupancy** — the reference's grid update is multiplicative (free decay
  ``p *= 0.9``, endpoint reinforcement, `process.py:144-169`), i.e. additive
  in log space.  Each robot raycasts its own update against the SAME shared
  grid and the per-robot log-odds deltas are ``lax.psum``-ed: simultaneous
  composition, exactly commutative — no robot-ordering artifact, unlike any
  sequential merge.
* **Map points** — each robot's filtered insert candidates (a scan-sized
  buffer) ride one ``lax.all_gather``; every device then runs the identical
  replicated merge (concat -> maintenance -> compact), keeping the map
  replicated without a broadcast.
* **Registration** — every robot registers against the SHARED map, so each
  benefits from geometry its peers observed (true collaborative SLAM; the
  reference's multi-robot story is one process per robot with no data
  exchange at all, SURVEY.md section 2.6).

With one robot per device (the intended layout) the per-robot compute is
scalar inside `shard_map`, so data-dependent branches (ICP early-exit, the
GICP rescue, maintenance cadence) stay REAL branches — the property the
vmapped fleet loses.

``reseed_after_rejects`` is intentionally ignored here: the reseed recovery
rebuilds the map from one robot's current scan, which would discard the
whole FLEET's shared map because one robot lost tracking.  Per-robot
recovery in a shared-map world is a relocalisation problem, out of scope.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map  # jax >= 0.8 (check_vma kw; older jax had
# jax.experimental.shard_map with check_rep)

from icp_slam_yolo_tpu.config import MAP_MAINTENANCE_INTERVAL, SlamConfig
from icp_slam_yolo_tpu.core.registration import icp_masked
from icp_slam_yolo_tpu.ops import geometry as geo
from icp_slam_yolo_tpu.ops.outliers import dynamic_points_mask, statistical_outlier_mask
from icp_slam_yolo_tpu.ops.raster import occupancy_keep_mask, prune_keep_mask, update_occupancy
from icp_slam_yolo_tpu.ops.voxel import compact, voxel_downsample
from icp_slam_yolo_tpu.parallel.mesh import make_mesh

_P_EPS = 1e-6  # occupancy probabilities clipped into [eps, 1] before log


class SharedOutputs(NamedTuple):
    # per-robot, per-PROCESSED-scan: scan 0 of each stream seeds the shared
    # map, so replaying (R, T, ...) scans yields (R, T-1, ...) outputs — row t
    # is the result of scan t+1
    pose: jnp.ndarray      # (R, T-1, 3)
    rmse: jnp.ndarray      # (R, T-1)
    accepted: jnp.ndarray  # (R, T-1)


def _merge_occupancy(base: jnp.ndarray, per_robot: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Log-space simultaneous composition of every robot's grid update.

    ``per_robot`` is this robot's updated grid computed against ``base``; the
    summed log-ratio over the mesh axis applies all updates at once.  Exact
    for the multiplicative free-space decay; endpoint reinforcement composes
    as the product of per-robot ratios (clipped back into [eps, 1]).
    """
    log_base = jnp.log(jnp.clip(base, _P_EPS, 1.0))
    d = jnp.log(jnp.clip(per_robot, _P_EPS, 1.0)) - log_base
    d = jax.lax.psum(d, axis)
    return jnp.clip(jnp.exp(log_base + d), _P_EPS, 1.0)


def _robot_step(map_xy, map_valid, occ, pose, prev_pose, prev_xy, prev_valid, scan, cfg: SlamConfig):
    """One robot's local work against the shared (replicated) map state.

    Returns per-robot results plus its merge contributions: the occupancy
    grid it would produce alone, and its filtered insert candidates.
    Mirrors `slam/pipeline.make_step`'s realtime order of operations.
    """
    xy, valid = geo.polar_to_cartesian(scan, cfg.gate)
    if cfg.use_outlier_filter:
        valid = statistical_outlier_mask(xy, valid, cfg.outlier_nb_neighbors, cfg.outlier_std_ratio)
    enough = jnp.sum(valid) >= cfg.icp.min_points

    d2 = jnp.sum((map_xy - pose[:2]) ** 2, axis=-1)
    local = map_valid & (d2 < jnp.float32(cfg.local_map_radius_mm) ** 2)
    use_local = jnp.sum(local) >= cfg.min_local_map_points
    tgt_valid = jnp.where(use_local, local, map_valid)

    ds_xy, ds_valid = voxel_downsample(xy, valid, cfg.icp.voxel_size_mm)
    init_pose = geo.se2_extrapolate(pose, prev_pose) if cfg.motion_model else pose
    res = icp_masked(ds_xy, ds_valid, map_xy, tgt_valid, init_pose, cfg.icp)
    accepted = enough & (res.rmse <= cfg.icp.max_rmse)

    if cfg.icp.rescue_estimator:
        # second-chance registration on reject, same as the sequential engine
        # (`slam/pipeline.make_step`); per-robot code is scalar inside
        # shard_map, so the cond stays a real taken-branch
        import dataclasses as _dc

        rescue_cfg = _dc.replace(
            cfg.icp, estimator=cfg.icp.rescue_estimator, rescue_estimator="", backend="xla"
        )
        res = jax.lax.cond(
            accepted,
            lambda _: res,
            lambda _: icp_masked(ds_xy, ds_valid, map_xy, tgt_valid, init_pose, rescue_cfg),
            None,
        )
        accepted = enough & (res.rmse <= cfg.icp.max_rmse)

    new_pose = jnp.where(accepted, res.pose, pose)
    new_global = geo.se2_apply(res.pose, xy)
    cur_xy = jnp.where(accepted, new_global, prev_xy)
    cur_valid = jnp.where(accepted, valid, prev_valid)

    # insert candidates (filtered against the shared pre-update state)
    dd_xy, dd_valid = voxel_downsample(new_global, valid, cfg.duplicate_voxel_mm)
    add_valid = dynamic_points_mask(dd_xy, dd_valid, prev_xy, prev_valid, cfg.dynamic_distance_mm)
    add_valid = occupancy_keep_mask(dd_xy, add_valid, occ, cfg.map, cfg.occupancy.free_threshold)
    add_valid = add_valid & accepted & enough

    # this robot's occupancy update against the SHARED base grid
    occ_xy, occ_valid = voxel_downsample(cur_xy, cur_valid, 2.0 * cfg.map.resolution_mm_per_px)
    occ_valid = occ_valid & enough
    occ_r = update_occupancy(occ, occ_xy, occ_valid, new_pose[:2], cfg.map, cfg.occupancy)

    new_pose = jnp.where(enough, new_pose, pose)
    return (new_pose, pose, cur_xy, cur_valid, occ_r, dd_xy, add_valid,
            res.rmse, accepted)


@partial(jax.jit, static_argnames=("cfg", "mesh", "axis"))
def shared_fleet_run(scans: jnp.ndarray, cfg: SlamConfig = SlamConfig(), mesh=None, axis: str = "data"):
    """Replay ``(R, T, n_max, 3)`` scan stacks for R robots building ONE map.

    The robot axis is sharded over ``mesh``'s ``axis``; map + occupancy stay
    replicated, merged each step with `psum`/`all_gather`.  R must equal the
    mesh axis size (one robot per device keeps per-robot branches real).
    Returns ``(map_xy, map_valid, occ, poses, SharedOutputs)``.
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.shape[axis]
    r, t = scans.shape[0], scans.shape[1]
    if r != n_dev:
        raise ValueError(f"shared fleet wants one robot per device: R={r} vs mesh {axis}={n_dev}")

    def run_block(scans_block):
        # scans_block: (1, T, n_max, 3) — this device's robot
        scan0 = scans_block[0, 0]
        xy0, valid0 = geo.polar_to_cartesian(scan0, cfg.gate)

        # shared seed: every robot's first scan merged at the identity pose
        cap = cfg.map_capacity
        cand_xy = jax.lax.all_gather(xy0, axis, tiled=True)
        cand_valid = jax.lax.all_gather(valid0, axis, tiled=True)
        map_xy, map_valid = compact(cand_xy, cand_valid, cap)
        occ0 = jnp.full((cfg.map.height_px, cfg.map.width_px), 0.5, jnp.float32)
        occ_r = update_occupancy(occ0, xy0, valid0, jnp.zeros(2, jnp.float32), cfg.map, cfg.occupancy)
        occ = _merge_occupancy(occ0, occ_r, axis)

        rstate = (
            geo.se2_identity(),            # pose
            geo.se2_identity(),            # prev_pose
            jnp.zeros_like(xy0),           # prev_xy
            jnp.zeros(xy0.shape[0], bool), # prev_valid
        )

        def body(carry, scan_t):
            map_xy, map_valid, occ, rstate, tick = carry
            pose, prev_pose, prev_xy, prev_valid = rstate
            (new_pose, old_pose, cur_xy, cur_valid, occ_r, dd_xy, add_valid,
             rmse, accepted) = _robot_step(
                map_xy, map_valid, occ, pose, prev_pose, prev_xy, prev_valid,
                scan_t[0], cfg)

            # --- collectives: merge every robot's contribution -------------
            new_occ = _merge_occupancy(occ, occ_r, axis)
            cand_xy = jax.lax.all_gather(dd_xy, axis, tiled=True)      # (R*N, 2)
            cand_valid = jax.lax.all_gather(add_valid, axis, tiled=True)

            big_xy = jnp.concatenate([map_xy, cand_xy], axis=0)
            big_valid = jnp.concatenate([map_valid, cand_valid], axis=0)

            # maintenance on the shared map: tick is device-uniform, so the
            # cond stays a real branch and every device takes the same side.
            # Prune uses the fleet centroid as the window anchor.
            anchor = jax.lax.psum(new_pose[:2], axis) / n_dev

            def _maintain(args):
                bxy, bval = args
                pruned = prune_keep_mask(bxy, bval, new_occ, anchor, cfg.map, cfg.occupancy)
                ds_xy2, ds_valid2 = voxel_downsample(bxy, pruned, cfg.map_downsample_voxel_mm)
                over = jnp.sum(pruned) > cfg.map_downsample_trigger
                return jnp.where(over, ds_xy2, bxy), jnp.where(over, ds_valid2, pruned)

            do_maint = ((tick + 1) % MAP_MAINTENANCE_INTERVAL) == 0
            big_xy, big_valid = jax.lax.cond(
                do_maint, _maintain, lambda a: (a[0], a[1]), (big_xy, big_valid)
            )
            map_xy, map_valid = compact(big_xy, big_valid, cap)

            new_rstate = (new_pose, old_pose, cur_xy, cur_valid)
            out = (new_pose, rmse, accepted)
            return (map_xy, map_valid, new_occ, new_rstate, tick + 1), out

        xs = scans_block[0, 1:][:, None]  # (T-1, 1, n_max, 3)
        carry, outs = jax.lax.scan(body, (map_xy, map_valid, occ, rstate, jnp.int32(0)), xs)
        map_xy, map_valid, occ, rstate, _ = carry
        poses_t, rmse_t, acc_t = outs  # (T-1, ...) this robot
        return (
            map_xy, map_valid, occ,
            rstate[0][None],                 # (1, 3) final pose, robot-sharded
            poses_t[None], rmse_t[None], acc_t[None],
        )

    run = shard_map(
        run_block, mesh=mesh,
        in_specs=(P(axis),),
        out_specs=(P(), P(), P(), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    map_xy, map_valid, occ, poses, pose_t, rmse_t, acc_t = run(jnp.asarray(scans))
    return map_xy, map_valid, occ, poses, SharedOutputs(pose_t, rmse_t, acc_t)
