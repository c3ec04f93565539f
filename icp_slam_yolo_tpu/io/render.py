"""Map rendering helpers: scan overlays, robot pose, ICP debug view.

Mirrors the reference's drawing utilities without OpenCV:
  * `draw_points` / `draw_robot_pose` / `draw_target` — `process.py:180-200,251-256`
  * `icp_debug_view` — `mainn.py:89-132` `create_icp_visualization`: map points
    vs current scan rendered in the ROBOT frame (map transformed by the
    inverse pose), the visual registration check shown in the panel's second
    window.
Output arrays are (H, W, 3) uint8 RGB.
"""

from __future__ import annotations

import numpy as np

from icp_slam_yolo_tpu.config import MapConfig


def occupancy_rgb(occ: np.ndarray) -> np.ndarray:
    g = ((1.0 - np.asarray(occ)) * 255.0).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


def _to_px(points_xy: np.ndarray, map_cfg: MapConfig):
    cx, cy = map_cfg.center_px
    res = map_cfg.resolution_mm_per_px
    px = np.trunc(cx + points_xy[:, 0] / res).astype(int)
    py = np.trunc(cy - points_xy[:, 1] / res).astype(int)
    return px, py


def draw_points(img: np.ndarray, points_xy: np.ndarray, map_cfg: MapConfig,
                color=(0, 255, 0), radius: int = 1) -> np.ndarray:
    h, w = img.shape[:2]
    px, py = _to_px(np.asarray(points_xy), map_cfg)
    for dx in range(-radius, radius + 1):
        for dy in range(-radius, radius + 1):
            x = np.clip(px + dx, 0, w - 1)
            y = np.clip(py + dy, 0, h - 1)
            ok = (px >= 0) & (px < w) & (py >= 0) & (py < h)
            img[y[ok], x[ok]] = color
    return img


def draw_robot_pose(img: np.ndarray, pose_se2, map_cfg: MapConfig,
                    axis_length_mm: float = 300.0) -> np.ndarray:
    h, w = img.shape[:2]
    x, y, theta = pose_se2
    px, py = _to_px(np.asarray([[x, y]]), map_cfg)
    px, py = int(px[0]), int(py[0])
    ex = px + axis_length_mm * np.cos(theta) / map_cfg.resolution_mm_per_px
    ey = py - axis_length_mm * np.sin(theta) / map_cfg.resolution_mm_per_px
    n = 32
    xs = np.linspace(px, ex, n).astype(int)
    ys = np.linspace(py, ey, n).astype(int)
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok]] = (255, 0, 0)
    for dx in (-2, -1, 0, 1, 2):
        for dy in (-2, -1, 0, 1, 2):
            if dx * dx + dy * dy <= 4 and 0 <= py + dy < h and 0 <= px + dx < w:
                img[py + dy, px + dx] = (0, 0, 255)
    return img


def draw_target(img: np.ndarray, target_xy, map_cfg: MapConfig, color=(255, 255, 0)) -> np.ndarray:
    return draw_points(img, np.asarray([target_xy]), map_cfg, color=color, radius=3)


def icp_debug_view(map_points_xy: np.ndarray, scan_points_xy: np.ndarray, pose_se2,
                   size_px: int = 600, mm_per_px: float = 30.0) -> np.ndarray:
    """Map (blue) vs raw scan (green) in the ROBOT frame (`mainn.py:89-132`)."""
    img = np.zeros((size_px, size_px, 3), np.uint8)
    x, y, theta = pose_se2
    c, s = np.cos(-theta), np.sin(-theta)

    def to_robot(pts):
        p = np.asarray(pts, float).reshape(-1, 2) - [x, y]
        return np.stack([c * p[:, 0] - s * p[:, 1], s * p[:, 0] + c * p[:, 1]], axis=1)

    def put(pts_robot, color):
        px = (size_px // 2 + pts_robot[:, 0] / mm_per_px).astype(int)
        py = (size_px // 2 - pts_robot[:, 1] / mm_per_px).astype(int)
        ok = (px >= 0) & (px < size_px) & (py >= 0) & (py < size_px)
        img[py[ok], px[ok]] = color

    if len(map_points_xy):
        put(to_robot(map_points_xy), (80, 120, 255))
    if len(scan_points_xy):
        put(np.asarray(scan_points_xy, float).reshape(-1, 2), (0, 255, 0))
    img[size_px // 2 - 2 : size_px // 2 + 3, size_px // 2 - 2 : size_px // 2 + 3] = (255, 0, 0)
    return img


def annotate_detections(frame: np.ndarray, detections: dict,
                        camera_data: dict | None = None) -> np.ndarray:
    """Draw detection boxes, scores, keypoints and the pallet-alignment
    readout onto a camera frame.

    Mirrors the reference's operator overlay (`mainn.py:236-248`:
    cv2.rectangle per box + cv2.putText alignment lines on the stereo frames
    shown in the display loop, `mainn.py:771-780`) using PIL instead of
    OpenCV.  ``detections`` is a `Detector.__call__` output dict (``boxes``
    (N,4) xyxy in frame pixels, ``scores``, ``classes``, optional
    ``keypoints`` (N,K,3)); ``camera_data`` is the SSE alignment payload
    ({yaw_deg, distance_mm, lateral_mm, direction}).  Returns a new
    (H, W, 3) uint8 RGB array.
    """
    from PIL import Image, ImageDraw

    img = Image.fromarray(np.ascontiguousarray(frame, np.uint8))
    draw = ImageDraw.Draw(img)
    boxes = np.asarray(detections.get("boxes", np.zeros((0, 4))), float)
    scores = np.asarray(detections.get("scores", np.zeros(len(boxes))), float)
    for box, score in zip(boxes, scores):
        x0, y0, x1, y1 = (float(v) for v in box[:4])
        draw.rectangle([x0, y0, x1, y1], outline=(0, 255, 0), width=2)
        draw.text((x0 + 2, max(0.0, y0 - 12)), f"pallet {score:.2f}", fill=(0, 255, 0))
    kpts = detections.get("keypoints")
    if kpts is not None:
        for inst in np.asarray(kpts, float):
            for kx, ky, vis in inst:
                if vis >= 0.5:
                    draw.ellipse([kx - 3, ky - 3, kx + 3, ky + 3], fill=(255, 0, 255))
    if camera_data is not None:
        lines = [
            f"dist {camera_data['distance_mm']:.0f} mm",
            f"yaw {camera_data['yaw_deg']:.1f} deg",
            f"lateral {camera_data['lateral_mm']:.0f} mm",
            {-1: "<< steer left", 0: "aligned", 1: "steer right >>"}.get(
                int(camera_data.get("direction", 0)), ""),
        ]
        draw.rectangle([4, 4, 150, 8 + 13 * len(lines)], fill=(0, 0, 0))
        for i, line in enumerate(lines):
            draw.text((8, 6 + 13 * i), line, fill=(255, 255, 0))
    return np.asarray(img)
