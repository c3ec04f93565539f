"""High-level host API wrapping the compiled pipeline.

This is the user-facing equivalent of the reference's script-level loop
(`slam_offline.py:320-455`): construct, feed scans (from disk or live), read
poses/maps, persist artifacts.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.config import MapConfig, SlamConfig
from icp_slam_yolo_tpu.io import maps as maps_io
from icp_slam_yolo_tpu.io import scans as scans_io
from icp_slam_yolo_tpu.slam import pipeline


class Slam:
    """Streaming SLAM engine: ``add_scan`` per scan or ``run`` for a sequence."""

    def __init__(self, cfg: SlamConfig = SlamConfig()):
        self.cfg = cfg
        self.state: pipeline.SlamState | None = None
        self._steps: dict = {}  # cfg -> jitted step (mode toggles reuse
        # their compiled program; a fresh jax.jit wrapper per toggle would
        # recompile the whole pipeline, a 1-3 min stall in this environment)
        self._step = self._compiled_step(cfg)
        self.trajectory: list[np.ndarray] = []
        self.rmse_history: list[float] = []

    def _compiled_step(self, cfg: SlamConfig):
        if cfg not in self._steps:
            self._steps[cfg] = jax.jit(pipeline.make_step(cfg))
        return self._steps[cfg]

    def reset(self) -> None:
        self.state = None
        self.trajectory = []
        self.rmse_history = []

    def set_localization(self, enabled: bool) -> None:
        """Switch the compiled step between mapping and localization-only
        semantics (the reference's ``update_mode`` flag, `mainn.py:679-695`,
        which its server set but never read).  Keeps the current state —
        poses keep tracking against the now-frozen (or now-live) map."""
        if self.cfg.localization_only == bool(enabled):
            return
        self.cfg = self.cfg.replace(localization_only=bool(enabled))
        self._step = self._compiled_step(self.cfg)

    def add_scan(self, scan: np.ndarray):
        """Feed one raw polar scan ``(N, 3)``; returns a `StepOutput`-like dict."""
        padded = jnp.asarray(scans_io.pad_scan(np.asarray(scan, np.float64), self.cfg.n_max))
        if self.state is None:
            self.state = pipeline.init_state(padded, self.cfg)
            out = {"pose": np.zeros(3), "rmse": 0.0, "accepted": True, "n_iters": 0}
        else:
            self.state, o = self._step(self.state, padded)
            out = {
                "pose": np.asarray(o.pose),
                "rmse": float(o.rmse),
                "accepted": bool(o.accepted),
                "n_iters": int(o.n_iters),
            }
        self.trajectory.append(out["pose"])
        self.rmse_history.append(out["rmse"])
        return out

    def run(self, scans: np.ndarray):
        """Replay a padded stack ``(T, n_max, 3)`` as one compiled program."""
        state, outs = pipeline.run_sequence(jnp.asarray(scans), self.cfg)
        self.state = state
        poses = np.concatenate([np.zeros((1, 3)), np.asarray(outs.pose)], axis=0)
        self.trajectory = list(poses)
        self.rmse_history = [0.0] + list(np.asarray(outs.rmse))
        return state, outs

    # --- accessors -------------------------------------------------------
    @property
    def pose(self) -> np.ndarray:
        return np.zeros(3) if self.state is None else np.asarray(self.state.pose)

    @property
    def pose44(self) -> np.ndarray:
        from icp_slam_yolo_tpu.ops.geometry import se2_to_mat44

        return np.asarray(se2_to_mat44(jnp.asarray(self.pose, jnp.float32)))

    def map_points(self) -> np.ndarray:
        if self.state is None:
            return np.zeros((0, 2), np.float32)
        xy = np.asarray(self.state.map_xy)
        valid = np.asarray(self.state.map_valid)
        return xy[valid]

    def occupancy(self) -> np.ndarray:
        if self.state is None:
            mc = self.cfg.map
            return np.full((mc.height_px, mc.width_px), 0.5, np.float32)
        return np.asarray(self.state.occ)

    # --- persistence (reference `mainn.py:34-69`, `slam_offline.py:446-455`)
    def save_map(self, base_path: str, map_cfg: MapConfig | None = None) -> None:
        mc = map_cfg or self.cfg.map
        maps_io.save_occupancy_png(self.occupancy(), base_path + ".png")
        maps_io.save_map_points_npy(self.map_points(), base_path + ".npy", mc)

    def save_pcd(self, path: str) -> None:
        maps_io.save_pcd(self.map_points(), path)

    # --- full-state checkpoint/resume (beyond the reference's PNG+npy) -----
    def save_state(self, path: str) -> None:
        """Persist the complete SLAM state (pose, map, occupancy, counters)."""
        if self.state is None:
            raise RuntimeError("no state to save")
        np.savez_compressed(
            path,
            **{k: np.asarray(v) for k, v in self.state._replace()._asdict().items()},
        )

    def load_state(self, path: str) -> None:
        """Resume from a saved state file (``.npz``)."""
        import jax.numpy as jnp

        data = np.load(path if path.endswith(".npz") else path + ".npz")
        fields = {k: jnp.asarray(data[k]) for k in data.files}
        # checkpoints written before the motion-model field default to the
        # static init (prev_pose == pose); pre-reseed checkpoints default to
        # a zero reject run
        fields.setdefault("prev_pose", fields["pose"])
        fields.setdefault("reject_run", jnp.int32(0))
        self.state = pipeline.SlamState(**fields)
