"""The SLAM odometry pipeline: one compiled scan -> pose -> map step.

Implements the reference's offline loop order of operations
(`slam_offline.py:344-428`) as a single jitted function over fixed-shape masked
state, then runs whole sequences under ``jax.lax.scan`` — the 1800-scan replay
is ONE XLA program with zero per-scan host round-trips (the TPU-native
replacement for the reference's SLAM thread, SURVEY.md section 2.6).

Per accepted scan (offline semantics):
  gate scan -> local-map mask -> voxel-downsample scan -> ICP (init = pose) ->
  RMSE gate -> transform to global -> dynamic-point filter vs previous scan ->
  occupancy free-space filter -> insert into map -> voxel-downsample map when
  over trigger -> occupancy raycast update -> prune map by occupancy.
A rejected scan (``rmse > max_rmse`` or too few points) changes nothing
(`slam_offline.py:386-387` `continue`).  Realtime semantics
(`mainn.py:316-340`: keep pose on reject but still insert/update) are selected
by ``cfg.realtime_semantics``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from icp_slam_yolo_tpu.config import MAP_MAINTENANCE_INTERVAL, SlamConfig
from icp_slam_yolo_tpu.core.registration import icp_masked
from icp_slam_yolo_tpu.ops import geometry as geo
from icp_slam_yolo_tpu.ops.outliers import dynamic_points_mask, statistical_outlier_mask
from icp_slam_yolo_tpu.ops.raster import occupancy_keep_mask, prune_keep_mask, update_occupancy
from icp_slam_yolo_tpu.ops.voxel import compact, voxel_downsample, voxel_downsample_batched


class SlamState(NamedTuple):
    pose: jnp.ndarray       # (3,) SE(2) global pose
    prev_pose: jnp.ndarray  # (3,) pose before the last processed scan (drives
    # the optional constant-velocity ICP init; equals `pose` at start-up and
    # after rejected scans, which degrades to the reference's static init)
    map_xy: jnp.ndarray     # (CAP, 2) float32 global map points (mm)
    map_valid: jnp.ndarray  # (CAP,) bool
    occ: jnp.ndarray        # (H, W) float32 occupancy probabilities
    prev_xy: jnp.ndarray    # (N, 2) previous accepted scan in global frame
    prev_valid: jnp.ndarray # (N,) bool
    step: jnp.ndarray        # int32 scan counter (every scan)
    maint_count: jnp.ndarray  # int32 processed-scan counter for the every-10-
    # scans maintenance (`mainn.py:342`; skipped scans don't count)
    reject_run: jnp.ndarray  # int32 consecutive-reject counter driving the
    # optional recovery reseed (`cfg.reseed_after_rejects`)


class StepOutput(NamedTuple):
    pose: jnp.ndarray      # (3,)
    rmse: jnp.ndarray      # scalar
    accepted: jnp.ndarray  # bool
    n_points: jnp.ndarray  # gated point count
    n_iters: jnp.ndarray   # ICP iterations actually executed (observability;
    # the fused kernel's early-exit makes this the step's main cost driver)


@partial(jax.jit, static_argnames=("cfg",))
def init_state(first_scan: jnp.ndarray, cfg: SlamConfig = SlamConfig()) -> SlamState:
    """Seed state from the first scan (`slam_offline.py:333-342`): map <- gated
    points, occupancy update from the identity pose."""
    xy, valid = geo.polar_to_cartesian(first_scan, cfg.gate)
    cap = cfg.map_capacity
    map_xy = jnp.zeros((cap, 2), jnp.float32).at[: xy.shape[0]].set(xy)
    map_valid = jnp.zeros(cap, bool).at[: xy.shape[0]].set(valid)
    occ = jnp.full((cfg.map.height_px, cfg.map.width_px), 0.5, jnp.float32)
    occ = update_occupancy(occ, xy, valid, jnp.zeros(2, jnp.float32), cfg.map, cfg.occupancy)
    return SlamState(
        pose=geo.se2_identity(),
        prev_pose=geo.se2_identity(),
        map_xy=map_xy,
        map_valid=map_valid,
        occ=occ,
        prev_xy=jnp.zeros_like(xy),
        prev_valid=jnp.zeros(xy.shape[0], bool),
        step=jnp.int32(0),
        maint_count=jnp.int32(0),
        reject_run=jnp.int32(0),
    )


def _reseed_state(state: SlamState, xy, valid, cfg: SlamConfig) -> SlamState:
    """Recovery reseed (extension beyond the reference, see
    `cfg.reseed_after_rejects`): rebuild map + occupancy from the current
    gated scan at the held pose, exactly like `init_state` but mid-sequence."""
    cur = geo.se2_apply(state.pose, xy)
    cap = cfg.map_capacity
    map_xy = jnp.zeros((cap, 2), jnp.float32).at[: cur.shape[0]].set(cur)
    map_valid = jnp.zeros(cap, bool).at[: cur.shape[0]].set(valid)
    occ = jnp.full((cfg.map.height_px, cfg.map.width_px), 0.5, jnp.float32)
    occ = update_occupancy(occ, cur, valid, state.pose[:2], cfg.map, cfg.occupancy)
    return state._replace(
        map_xy=map_xy, map_valid=map_valid, occ=occ, prev_xy=cur, prev_valid=valid,
    )


def make_step(cfg: SlamConfig = SlamConfig()):
    """Build the jittable ``step(state, scan[, tick]) -> (state, StepOutput)``.

    ``tick`` (optional int32 scalar) drives the realtime maintenance cadence
    from a *lane-uniform* counter instead of the per-lane processed-scan
    count.  Fleets pass the sequence index here: an unbatched predicate keeps
    the maintenance ``lax.cond`` a real branch under ``vmap`` (a batched one
    lowers to select and every lane pays the prune + downsample sorts every
    step — the biggest cost of the vmapped realtime step).  ``None`` (the
    sequential default) keeps the reference's per-lane count
    (`mainn.py:342`); the two coincide whenever no scan is skipped for lack
    of points.
    """

    def step(state: SlamState, scan_raw: jnp.ndarray, tick: jnp.ndarray | None = None):
        xy, valid = geo.polar_to_cartesian(scan_raw, cfg.gate)
        if cfg.use_outlier_filter:
            valid = statistical_outlier_mask(xy, valid, cfg.outlier_nb_neighbors, cfg.outlier_std_ratio)
        n_points = jnp.sum(valid)
        enough = n_points >= cfg.icp.min_points

        # local-map mask (`slam_offline.py:365-376`): radius crop, full-map
        # fallback when fewer than `min_local_map_points` survive
        d2 = jnp.sum((state.map_xy - state.pose[:2]) ** 2, axis=-1)
        local = state.map_valid & (d2 < jnp.float32(cfg.local_map_radius_mm) ** 2)
        use_local = jnp.sum(local) >= cfg.min_local_map_points
        tgt_valid = jnp.where(use_local, local, state.map_valid)

        # optional: compact the target into a smaller buffer so the ICP kernel
        # sweeps fewer slots.  OFF by default: once the global map outgrows the
        # cap, the radius crop exceeds it too and dropping points degrades
        # registration (full-1800-replay acceptance fell 1448 -> 621 with an
        # 8192 cap).  Safe when local_map_capacity is sized for the arena.
        if cfg.local_map_capacity < cfg.map_capacity:
            tgt_xy, tgt_valid = compact(state.map_xy, tgt_valid, cfg.local_map_capacity)
        else:
            tgt_xy = state.map_xy

        # the reference downsamples the scan before GICP (`gicp_lidar.py:20`)
        ds_xy, ds_valid = voxel_downsample(xy, valid, cfg.icp.voxel_size_mm)
        # init: the reference uses the static current pose (`gicp_lidar.py:29`);
        # the optional motion model extrapolates the last inter-scan step
        init_pose = (
            geo.se2_extrapolate(state.pose, state.prev_pose) if cfg.motion_model else state.pose
        )
        res = icp_masked(ds_xy, ds_valid, tgt_xy, tgt_valid, init_pose, cfg.icp)
        accepted = enough & (res.rmse <= cfg.icp.max_rmse)

        if cfg.icp.rescue_estimator:
            # second-chance registration for rejected scans (the reference's
            # GICP estimator, `gicp_lidar.py:23-35`, targets exactly the
            # corridor-like geometry where gated p2p fails the RMSE gate).
            # lax.cond executes only the taken branch sequentially, so the
            # rescue is ~free on the 95-99% of scans that pass.
            import dataclasses as _dc

            rescue_cfg = _dc.replace(
                cfg.icp, estimator=cfg.icp.rescue_estimator, rescue_estimator="", backend="xla"
            )
            res = jax.lax.cond(
                accepted,
                lambda _: res,
                lambda _: icp_masked(ds_xy, ds_valid, tgt_xy, tgt_valid, init_pose, rescue_cfg),
                None,
            )
            accepted = enough & (res.rmse <= cfg.icp.max_rmse)

        def do_update(op):
            state, pose = op
            cur_xy = geo.se2_apply(pose, xy)
            cur_valid = valid
            if cfg.use_duplicate_filter:
                cur_dd, valid_dd = voxel_downsample(cur_xy, cur_valid, cfg.duplicate_voxel_mm)
            else:
                cur_dd, valid_dd = cur_xy, cur_valid
            add_valid = dynamic_points_mask(
                cur_dd, valid_dd, state.prev_xy, state.prev_valid, cfg.dynamic_distance_mm
            )
            add_valid = occupancy_keep_mask(
                cur_dd, add_valid, state.occ, cfg.map, cfg.occupancy.free_threshold
            )

            big_xy = jnp.concatenate([state.map_xy, cur_dd], axis=0)
            big_valid = jnp.concatenate([state.map_valid, add_valid], axis=0)
            count = jnp.sum(big_valid)
            ds_map_xy, ds_map_valid = voxel_downsample(big_xy, big_valid, cfg.map_downsample_voxel_mm)
            over = count > cfg.map_downsample_trigger
            big_xy = jnp.where(over, ds_map_xy, big_xy)
            big_valid = jnp.where(over, ds_map_valid, big_valid)

            occ = update_occupancy(state.occ, cur_xy, cur_valid, pose[:2], cfg.map, cfg.occupancy)
            big_valid = prune_keep_mask(big_xy, big_valid, occ, pose[:2], cfg.map, cfg.occupancy)
            map_xy, map_valid = compact(big_xy, big_valid, cfg.map_capacity)

            return SlamState(
                pose=pose,
                prev_pose=state.pose,
                map_xy=map_xy,
                map_valid=map_valid,
                occ=occ,
                prev_xy=cur_xy,
                prev_valid=cur_valid,
                step=state.step + 1,
                maint_count=state.maint_count + 1,
                reject_run=state.reject_run,
            )

        def no_update(op):
            state, _ = op
            return state._replace(step=state.step + 1, prev_pose=state.pose)

        if cfg.localization_only:
            # pose tracking against a frozen map (`update_mode=0`)
            pose = jnp.where(accepted, res.pose, state.pose)
            cur_xy = geo.se2_apply(pose, xy)
            new_state = state._replace(
                pose=pose,
                prev_pose=state.pose,
                prev_xy=jnp.where(accepted, cur_xy, state.prev_xy),
                prev_valid=jnp.where(accepted, valid, state.prev_valid),
                step=state.step + 1,
            )
        elif cfg.realtime_semantics:
            new_state = _realtime_update(state, xy, valid, res, accepted, cfg, tick)
            new_state = jax.tree.map(
                lambda new, old: jnp.where(enough, new, old),
                new_state,
                state._replace(step=state.step + 1),
            )
        else:
            new_state = jax.lax.cond(accepted, do_update, no_update, (state, res.pose))

        if cfg.reseed_after_rejects > 0 and not cfg.localization_only:
            run = jnp.where(accepted, jnp.int32(0), state.reject_run + 1)
            need = (~accepted) & enough & (run >= cfg.reseed_after_rejects)
            new_state = jax.lax.cond(
                need, lambda s: _reseed_state(s, xy, valid, cfg), lambda s: s, new_state
            )
            new_state = new_state._replace(reject_run=jnp.where(need, 0, run))

        out = StepOutput(
            pose=new_state.pose, rmse=res.rmse, accepted=accepted,
            n_points=n_points, n_iters=res.n_iters,
        )
        return new_state, out

    return step


def _realtime_update(
    state: SlamState, xy, valid, res, accepted, cfg: SlamConfig, tick=None
) -> SlamState:
    """Realtime-mode state update (`mainn.py:316-361`).

    On accept: pose <- T; insert dedup(30) -> dynamic(300) -> occupancy-filtered
    points.  On reject: pose AND the displayed/occupancy scan stay the
    *previous* scan's global points (`mainn.py:333-340` — current_points_global
    is not recomputed).  Either way the occupancy grid updates with the
    current points deduped at 2x resolution (`mainn.py:338`), and every
    `MAP_MAINTENANCE_INTERVAL` scans the map is pruned + downsampled
    (`mainn.py:344-361`).
    """
    pose = jnp.where(accepted, res.pose, state.pose)
    new_global = geo.se2_apply(res.pose, xy)
    cur_xy = jnp.where(accepted, new_global, state.prev_xy)
    cur_valid = jnp.where(accepted, valid, state.prev_valid)

    # the two post-ICP scan downsamples — duplicate filter (30 mm,
    # `mainn.py:320`) and occupancy dedup (2x grid resolution, `mainn.py:338`)
    # — run as ONE batched sort+prefix-sum call (separate N=512 calls were
    # dispatch-bound)
    (dd_xy, occ_xy), (dd_valid, occ_valid) = voxel_downsample_batched(
        jnp.stack([new_global, cur_xy]),
        jnp.stack([valid, cur_valid]),
        (cfg.duplicate_voxel_mm, 2.0 * cfg.map.resolution_mm_per_px),
    )

    # insertion pipeline (accept only)
    add_valid = dynamic_points_mask(dd_xy, dd_valid, state.prev_xy, state.prev_valid, cfg.dynamic_distance_mm)
    add_valid = occupancy_keep_mask(dd_xy, add_valid, state.occ, cfg.map, cfg.occupancy.free_threshold)
    add_valid = add_valid & accepted

    big_xy = jnp.concatenate([state.map_xy, dd_xy], axis=0)
    big_valid = jnp.concatenate([state.map_valid, add_valid], axis=0)
    occ = update_occupancy(state.occ, occ_xy, occ_valid, pose[:2], cfg.map, cfg.occupancy)

    # periodic maintenance (counts only processed scans, `mainn.py:342`),
    # behind a real lax.cond: 9 out of 10 steps skip the prune lookup and the
    # map-buffer downsample sorts entirely.  With the default per-lane counter
    # the predicate is batched under vmap (lowers to select — every lane pays
    # every step); a lane-uniform `tick` keeps it a scalar and the skip real.
    new_maint = state.maint_count + 1
    if tick is None:
        do_maint = (new_maint % MAP_MAINTENANCE_INTERVAL) == 0
    else:
        do_maint = ((tick + 1) % MAP_MAINTENANCE_INTERVAL) == 0

    def _maintain(args):
        bxy, bval, occ_, p2 = args
        pruned = prune_keep_mask(bxy, bval, occ_, p2, cfg.map, cfg.occupancy)
        ds_xy, ds_valid = voxel_downsample(bxy, pruned, cfg.map_downsample_voxel_mm)
        over = jnp.sum(pruned) > cfg.map_downsample_trigger
        return jnp.where(over, ds_xy, bxy), jnp.where(over, ds_valid, pruned)

    big_xy, big_valid = jax.lax.cond(
        do_maint, _maintain, lambda args: (args[0], args[1]), (big_xy, big_valid, occ, pose[:2])
    )
    map_xy, map_valid = compact(big_xy, big_valid, cfg.map_capacity)

    return SlamState(
        pose=pose,
        prev_pose=state.pose,
        map_xy=map_xy,
        map_valid=map_valid,
        occ=occ,
        prev_xy=cur_xy,
        prev_valid=cur_valid,
        step=state.step + 1,
        maint_count=new_maint,
        reject_run=state.reject_run,
    )


@partial(jax.jit, static_argnames=("cfg",))
def run_sequence(scans: jnp.ndarray, cfg: SlamConfig = SlamConfig()):
    """Replay a padded scan stack ``(T, n_max, 3)``: scan 0 seeds the state,
    scans 1..T-1 run through the step under ``lax.scan``.

    Returns ``(final_state, outputs)`` where ``outputs`` fields are stacked
    per-scan ``(T-1, ...)`` arrays (pose trajectory, RMSE, accept flags).
    """
    state = init_state(scans[0], cfg)
    step = make_step(cfg)
    final_state, outs = jax.lax.scan(step, state, scans[1:])
    return final_state, outs


def update_map(state: SlamState, scan_raw, pose, cfg: SlamConfig = SlamConfig()) -> SlamState:
    """Public ``update_map(scan, pose)`` API named in BASELINE.json: insert one
    gated scan into the map/occupancy at a given pose, skipping registration."""
    scan_raw = jnp.asarray(np.asarray(scan_raw, np.float32))
    pose = jnp.asarray(pose, jnp.float32)
    return _update_map_jit(state, scan_raw, pose, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _update_map_jit(state: SlamState, scan_raw, pose, cfg: SlamConfig):
    xy, valid = geo.polar_to_cartesian(scan_raw, cfg.gate)
    cur_xy = geo.se2_apply(pose, xy)
    add_valid = occupancy_keep_mask(cur_xy, valid, state.occ, cfg.map, cfg.occupancy.free_threshold)
    big_xy = jnp.concatenate([state.map_xy, cur_xy], axis=0)
    big_valid = jnp.concatenate([state.map_valid, add_valid], axis=0)
    occ = update_occupancy(state.occ, cur_xy, valid, pose[:2], cfg.map, cfg.occupancy)
    map_xy, map_valid = compact(big_xy, big_valid, cfg.map_capacity)
    return state._replace(pose=pose, map_xy=map_xy, map_valid=map_valid, occ=occ, step=state.step + 1)
