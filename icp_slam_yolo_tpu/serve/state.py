"""Shared server state: the SLAM engine, POIs, target, stream flags.

This replaces the reference's module-global state + ``threading.RLock``
(`mainn.py:20-25,388-391`): one lock-guarded object owning the engine, the
points of interest (persisted to ``points_of_interest.json`` in the reference's
format — a JSON list of ``[x_mm, y_mm]``, `mainn.py:71-87`), the active target
and the pause/capture flags.  A background thread replays a scan source
through the compiled pipeline (the reference's SLAM daemon thread,
`mainn.py:738`).
"""

from __future__ import annotations

import json
import math
import os
import threading
import time

import numpy as np

from icp_slam_yolo_tpu.config import CAMERA_TRIGGER_DISTANCE_MM, ROBOT_AXIS_LENGTH_MM, SlamConfig
from icp_slam_yolo_tpu.io import maps as maps_io
from icp_slam_yolo_tpu.slam.api import Slam

POI_FILE = "points_of_interest.json"


class ServerState:
    def __init__(self, cfg: SlamConfig = SlamConfig(), work_dir: str = ".", poi_file: str | None = None):
        self.cfg = cfg
        self.work_dir = work_dir
        self.lock = threading.RLock()
        self.engine = Slam(cfg)
        self.points_of_interest: list[list[float]] = []
        self.active_target: dict | None = None
        self.paused = threading.Event()
        self.stopped = threading.Event()
        self.capture_requested = False
        self.show_map = True
        self.show_icp = True
        self.update_mode = 1  # 1 = mapping, 0 = localization (`mainn.py:679-695`)
        self.distance_to_target: float | None = None
        self.camera_trigger = False
        self.last_scan_points_px: list[tuple[int, int]] = []
        self.last_scan_sensor = np.zeros((0, 2))
        self.last_camera_data: dict | None = None
        # latest annotated stereo JPEGs [left, right] + a sequence counter so
        # /camera_feed only pushes genuinely new frames (`mainn.py:771-780`
        # display loop equivalent)
        self.last_annotated_jpeg: list[bytes | None] = [None, None]
        self.camera_frame_seq = 0
        self.landmarks = None  # lazily created LandmarkMap
        self._camera_worker = None
        self._thread: threading.Thread | None = None
        self.poi_path = poi_file or os.path.join(work_dir, POI_FILE)
        self.load_pois()

    # --- POIs (`mainn.py:71-87,464-522`) ---------------------------------
    def load_pois(self) -> None:
        if os.path.exists(self.poi_path):
            with open(self.poi_path) as f:
                self.points_of_interest = json.load(f)

    def save_pois(self) -> None:
        with self.lock:
            with open(self.poi_path, "w") as f:
                json.dump(self.points_of_interest, f, indent=2)

    def add_poi(self) -> list[float]:
        with self.lock:
            pos = [float(self.engine.pose[0]), float(self.engine.pose[1])]
            self.points_of_interest.append(pos)
            self.save_pois()
            return pos

    def set_target(self, point_id: int | None):
        with self.lock:
            if point_id is None:
                self.active_target = None
                return True
            if 0 <= point_id < len(self.points_of_interest):
                self.active_target = {"id": point_id, "pos_mm": self.points_of_interest[point_id]}
                return True
            self.active_target = None
            return False

    # --- pixel conversions (`mainn.py:612-637` payload) -------------------
    def world_to_px(self, x: float, y: float) -> tuple[int, int]:
        cx, cy = self.cfg.map.center_px
        res = self.cfg.map.resolution_mm_per_px
        return int(cx + x / res), int(cy - y / res)

    def pose_payload(self) -> dict:
        x, y, theta = self.engine.pose
        px, py = self.world_to_px(x, y)
        ex = int(px + ROBOT_AXIS_LENGTH_MM * math.cos(theta) / self.cfg.map.resolution_mm_per_px)
        ey = int(py - ROBOT_AXIS_LENGTH_MM * math.sin(theta) / self.cfg.map.resolution_mm_per_px)
        return {"x": px, "y": py, "ex": ex, "ey": ey}

    def stream_payload(self) -> dict:
        with self.lock:
            payload: dict = {}
            if self.last_scan_points_px:
                payload["points"] = self.last_scan_points_px
            payload["pose"] = self.pose_payload()
            if self.distance_to_target is not None:
                payload["distance"] = f"{self.distance_to_target:.2f}"
            if self.engine.rmse_history:
                payload["rmse"] = f"{self.engine.rmse_history[-1]:.2f}"
            if self.last_camera_data is not None:
                payload["camera_data"] = self.last_camera_data
            return payload

    # --- SLAM worker -------------------------------------------------------
    def feed_scan(self, scan: np.ndarray) -> dict:
        """One scan through the engine + bookkeeping (target distance, trigger).

        The engine step runs under the state lock: `load_map`/`resume_mapping`
        swap `engine.state` and the compiled step under the same lock, and an
        unlocked in-flight `add_scan` would write a stale mapping-mode state
        back over the freshly loaded map.
        """
        with self.lock:
            out = self.engine.add_scan(scan)
            pose = out["pose"]
            from icp_slam_yolo_tpu.reference_impl.oracle import polar_gate, se2_apply

            pts = polar_gate(scan, self.cfg.gate)
            self.last_scan_sensor = pts
            world = se2_apply(np.asarray(pose, float), pts)
            self.last_scan_points_px = [self.world_to_px(p[0], p[1]) for p in world]
            self._update_target_distance(pose)
        return out

    def _update_target_distance(self, pose=None) -> None:
        """Refresh distance-to-target + the camera trigger (within 1 m of the
        target, `mainn.py:376-379`).  Called from `feed_scan` per scan AND from
        the camera trigger-sync loop so a target set after the scan stream
        ends still fires the camera.  Caller must hold the lock or pass a
        snapshot pose."""
        with self.lock:
            if pose is None:
                pose = self.engine.pose
            if self.active_target is not None:
                tx, ty = self.active_target["pos_mm"]
                self.distance_to_target = math.hypot(tx - pose[0], ty - pose[1])
                self.camera_trigger = self.distance_to_target < CAMERA_TRIGGER_DISTANCE_MM
            else:
                self.distance_to_target = None
                self.camera_trigger = False

    def warmup(self, detector=None) -> None:
        """Precompile the hot paths before serving: the first jit compile
        freezes every thread in this environment (remote compile holds the
        GIL ~1-3 min), so trigger it up front rather than mid-stream."""
        synth = np.zeros((64, 3))
        synth[:, 0] = 30.0
        synth[:, 1] = np.linspace(0, 100, 64)
        synth[:, 2] = 2000.0
        self.feed_scan(synth)
        self.engine.reset()
        self.last_scan_points_px = []
        if detector is not None:
            detector(np.zeros((480, 640, 3), np.uint8))

    def start_replay(self, scan_dir: str, start: int = 1, end: int | None = None, rate_hz: float = 10.0):
        """Background replay thread (the reference's `update_map` daemon)."""
        from icp_slam_yolo_tpu.io import scans as scans_io

        def worker():
            paths = (
                scans_io.sequence_paths(scan_dir, start, end)
                if end is not None
                else scans_io.discover_sequence(scan_dir)[start - 1 :]
            )
            for p in paths:
                if self.stopped.is_set():
                    break
                while self.paused.is_set() and not self.stopped.is_set():
                    time.sleep(0.05)
                try:
                    self.feed_scan(scans_io.load_scan(p))
                except Exception:
                    continue  # per-scan error-and-continue (`mainn.py:392-399`)
                time.sleep(max(0.0, 1.0 / rate_hz))

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    # --- map persistence ----------------------------------------------------
    def save_map(self, base_name: str) -> None:
        path = os.path.join(self.work_dir, base_name)
        self.engine.save_map(path, self.cfg.map)

    def map_png_bytes(self) -> bytes:
        import io as _io

        from PIL import Image

        img = Image.fromarray(maps_io.occupancy_to_image(self.engine.occupancy()), mode="L")
        buf = _io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    TILE_PX = 256

    def map_tiles_meta(self) -> dict:
        """Deep-zoom pyramid metadata for `/map_viewer` (the reference UI is
        an OpenSeadragon deep-zoom viewer, `templates/jjj.html:9,150`; this
        serves the same tiled-pyramid contract to a dependency-free canvas
        client).  Level ``zmax`` is native resolution; each lower level
        halves it."""
        import math

        h, w = self.cfg.map.height_px, self.cfg.map.width_px
        zmax = max(0, math.ceil(math.log2(max(h, w) / self.TILE_PX)))
        cx, cy = self.cfg.map.center_px
        return {
            "width": w, "height": h, "tile": self.TILE_PX, "zmax": zmax,
            "mm_per_px": self.cfg.map.resolution_mm_per_px,
            "center_px": [cx, cy],
        }

    def _tile_level(self, z: int, ttl_s: float = 0.5):
        """Level-``z`` uint8 rendering of the live map, cached for ``ttl_s``.

        A viewer redraw fetches up to ~50 tiles of the SAME level; without
        this cache each tile pays a device->host fetch of the full occupancy
        grid plus a full-map resize.  One render per (level, ttl window),
        guarded by the state lock (tile requests arrive on concurrent handler
        threads)."""
        import numpy as _np
        from PIL import Image

        with self.lock:
            now = time.time()
            if now - getattr(self, "_tile_cache_t", 0.0) > ttl_s:
                self._tile_cache = {}
                self._tile_cache_t = now
            lvl = self._tile_cache.get(z)
            if lvl is None:
                img = self._tile_cache.get("native")
                if img is None:
                    img = maps_io.occupancy_to_image(self.engine.occupancy())
                    self._tile_cache["native"] = img
                h, w = img.shape
                scale = 2**z
                if scale > 1:
                    lw, lh = max(1, round(w / scale)), max(1, round(h / scale))
                    lvl = _np.asarray(
                        Image.fromarray(img, "L").resize((lw, lh), Image.BILINEAR)
                    )
                else:
                    lvl = img
                self._tile_cache[z] = lvl
            return lvl

    def map_tile_png(self, z: int, x: int, y: int) -> bytes:
        """One ``TILE_PX``-square PNG tile of the live occupancy map at pyramid
        level ``z`` (0 = coarsest).  Out-of-map area is unpainted gray (127),
        matching `occupancy_to_image`'s unknown value."""
        import io as _io
        import math

        import numpy as _np
        from PIL import Image

        h, w = self.cfg.map.height_px, self.cfg.map.width_px
        t = self.TILE_PX
        zmax = max(0, math.ceil(math.log2(max(h, w) / t)))
        z = max(0, min(int(z), zmax))
        lvl = self._tile_level(zmax - z)
        lh, lw = lvl.shape
        canvas = _np.full((t, t), 127, _np.uint8)
        x0, y0 = int(x) * t, int(y) * t
        if x0 < lw and y0 < lh and x0 >= 0 and y0 >= 0:
            part = lvl[y0 : y0 + t, x0 : x0 + t]
            canvas[: part.shape[0], : part.shape[1]] = part
        buf = _io.BytesIO()
        Image.fromarray(canvas, "L").save(buf, format="PNG")
        return buf.getvalue()

    def attach_camera(self, detector, stereo, poll_s: float = 0.1) -> None:
        """Wire the perception loop (`mainn.py:135-266` camera worker): when
        the robot is within trigger distance of the target, run the detector
        on stereo pairs, compute the pallet alignment, publish it on the SSE
        stream (the reference UI's `camera_data` field, which its server never
        actually sent) and fuse the detection into the landmark map."""
        import numpy as _np

        from icp_slam_yolo_tpu.acquisition.camera import TriggeredCameraWorker
        from icp_slam_yolo_tpu.fusion import LandmarkMap, project_detection

        if self.landmarks is None:
            self.landmarks = LandmarkMap()
        trigger = threading.Event()
        self._camera_trigger_event = trigger

        def on_pair(f1, f2):
            if hasattr(detector, "detect_pair") and f1.shape == f2.shape:
                # both eyes in ONE batch-2 device call (~2x fewer dispatches
                # than the reference's per-eye predict, `mainn.py:175-176`)
                out1, out2 = detector.detect_pair(f1, f2)
            else:
                out1, out2 = detector(f1), detector(f2)
            if not len(out1["boxes"]) or not len(out2["boxes"]):
                # no pallet in one eye: still publish the (box-annotated) raw
                # frames so the operator sees what the camera sees
                self._publish_annotated((f1, out1), (f2, out2), None)
                return
            kpts_ok = (
                "keypoints" in out1 and "keypoints" in out2
                # an occluded corner (low visibility score) has unreliable xy:
                # fall back to box corners unless all four are confident
                and float(_np.min(out1["keypoints"][0][:, 2])) >= 0.5
                and float(_np.min(out2["keypoints"][0][:, 2])) >= 0.5
            )
            if kpts_ok:
                # pose detector: true ordered tl/tr/br/bl pallet corners —
                # better stereo geometry than axis-aligned box corners
                c1 = _np.asarray(out1["keypoints"][0][:, :2], _np.float64)
                c2 = _np.asarray(out2["keypoints"][0][:, :2], _np.float64)
            else:
                b1, b2 = out1["boxes"][0], out2["boxes"][0]
                c1 = _np.array([[b1[0], b1[1]], [b1[2], b1[1]], [b1[2], b1[3]], [b1[0], b1[3]]])
                c2 = _np.array([[b2[0], b2[1]], [b2[2], b2[1]], [b2[2], b2[3]], [b2[0], b2[3]]])
            from icp_slam_yolo_tpu.perception.stereo import pallet_alignment

            align = pallet_alignment(c1, c2)
            camera_data = {
                "yaw_deg": round(float(_np.rad2deg(align.yaw_rad)), 2),
                "distance_mm": round(float(align.distance_mm), 1),
                "lateral_mm": round(float(align.lateral_offset_mm), 1),
                "direction": int(align.direction),
            }
            with self.lock:
                pose = tuple(map(float, self.engine.pose))
                self.last_camera_data = camera_data
                self.landmarks.insert(
                    project_detection(pose, c1, c2, score=float(out1["scores"][0]), alignment=align)
                )
            self._publish_annotated((f1, out1), (f2, out2), camera_data)

        worker = TriggeredCameraWorker(stereo, trigger, self.stopped, on_pair, poll_s)
        worker.start()
        self._camera_worker = worker

        def trigger_sync():  # mirror the SLAM-side flag into the worker event
            while not self.stopped.is_set():
                # re-evaluate distance when a target exists, so a target set
                # while no scans are flowing (e.g. replay finished) still
                # fires the camera; without a target, leave the flag to
                # feed_scan / manual control
                if self.active_target is not None:
                    self._update_target_distance()
                if self.camera_trigger:
                    trigger.set()
                else:
                    trigger.clear()
                time.sleep(poll_s)

        threading.Thread(target=trigger_sync, daemon=True).start()

    def _publish_annotated(self, eye0, eye1, camera_data: dict | None) -> None:
        """Render the operator overlay onto both stereo frames and retain them
        as JPEGs for `/camera_feed` — the reference's annotated display frames
        (`mainn.py:236-248` box + alignment overlay, shown via the queue +
        display loop at `mainn.py:771-780`)."""
        import io as _io

        from PIL import Image

        from icp_slam_yolo_tpu.io.render import annotate_detections

        jpegs = []
        for frame, dets in (eye0, eye1):
            img = annotate_detections(frame, dets, camera_data)
            buf = _io.BytesIO()
            Image.fromarray(img).save(buf, format="JPEG", quality=85)
            jpegs.append(buf.getvalue())
        with self.lock:
            self.last_annotated_jpeg = jpegs
            self.camera_frame_seq += 1

    def camera_frame_jpeg(self, eye: int) -> bytes | None:
        """Latest annotated frame for one eye (0=left, 1=right), or None if
        the camera worker hasn't produced a frame yet."""
        with self.lock:
            if eye not in (0, 1):
                return None
            return self.last_annotated_jpeg[eye]

    def landmark_markers(self) -> list[dict]:
        with self.lock:
            return [] if self.landmarks is None else self.landmarks.to_pixel_markers(self.cfg.map)

    def icp_view_png_bytes(self) -> bytes:
        """ICP debug view (`mainn.py:89-132`): local map vs current scan in the
        robot frame."""
        import io as _io

        from PIL import Image

        from icp_slam_yolo_tpu.io.render import icp_debug_view

        with self.lock:
            img = icp_debug_view(self.engine.map_points(), self.last_scan_sensor, self.engine.pose)
        buf = _io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        return buf.getvalue()

    def _blank_state(self):
        """A SlamState with an empty map at the identity pose, for loading a
        saved map before any scan has been fed."""
        import jax.numpy as jnp

        from icp_slam_yolo_tpu.slam import pipeline as pl

        cfg = self.cfg
        return pl.SlamState(
            pose=jnp.zeros(3, jnp.float32),
            prev_pose=jnp.zeros(3, jnp.float32),
            map_xy=jnp.zeros((cfg.map_capacity, 2), jnp.float32),
            map_valid=jnp.zeros(cfg.map_capacity, bool),
            occ=jnp.full((cfg.map.height_px, cfg.map.width_px), 0.5, jnp.float32),
            prev_xy=jnp.zeros((cfg.n_max, 2), jnp.float32),
            prev_valid=jnp.zeros(cfg.n_max, bool),
            step=jnp.int32(0),
            maint_count=jnp.int32(0),
            reject_run=jnp.int32(0),
        )

    def _fill_map_points(self, pts_xy: np.ndarray) -> None:
        import jax.numpy as jnp

        cap = self.cfg.map_capacity
        xy = np.zeros((cap, 2), np.float32)
        n = min(len(pts_xy), cap)
        xy[:n] = pts_xy[:n, :2]
        valid = np.zeros(cap, bool)
        valid[:n] = True
        self.engine.state = self.engine.state._replace(
            map_xy=jnp.asarray(xy), map_valid=jnp.asarray(valid)
        )

    def load_map(self, filepath: str) -> None:
        """Load a PNG occupancy or PCD point map and switch the engine's
        compiled step to localization-only (`mainn.py:679-695` — where the
        reference set ``update_mode=0`` but nothing read it; here the map is
        genuinely frozen and ICP tracks the pose against it)."""
        import jax.numpy as jnp

        with self.lock:
            if self.engine.state is None:
                self.engine.state = self._blank_state()
            if filepath.lower().endswith((".png", ".jpg", ".jpeg")):
                occ = maps_io.load_occupancy_png(filepath)
                if occ.shape != (self.cfg.map.height_px, self.cfg.map.width_px):
                    raise ValueError("map image size does not match the configured grid")
                self.engine.state = self.engine.state._replace(occ=jnp.asarray(occ, jnp.float32))
                # ICP needs a point map: prefer the sibling .npy point dump
                # (save_map always writes the PNG + npy pair, like the
                # reference's ban_do_3.{png,npy}); fall back to occupied
                # cells -> world-mm cell corners.
                npy = os.path.splitext(filepath)[0] + ".npy"
                if os.path.exists(npy):
                    pts = maps_io.load_map_points_npy(npy, self.cfg.map)
                else:
                    py, px = np.nonzero(occ > self.cfg.occupancy.block_threshold)
                    pts = maps_io.pixels_to_points(np.stack([px, py], axis=1), self.cfg.map)
                self._fill_map_points(pts.astype(np.float32))
            elif filepath.lower().endswith(".pcd"):
                self._fill_map_points(maps_io.load_pcd(filepath))
            else:
                raise ValueError("unsupported map format")
            self.engine.set_localization(True)
            self.update_mode = 0

    def resume_mapping(self) -> None:
        """Leave localization mode: the engine's step goes back to inserting
        scans into the (loaded or built) map."""
        with self.lock:
            self.engine.set_localization(False)
            self.update_mode = 1
