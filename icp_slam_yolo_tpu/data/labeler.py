"""Labeling session: polygon annotation with resume, multi-format output and
YOLO-assisted auto-labeling.

Re-implements the reference's labeling toolchain core
(`labels_segmentation/labels_segmentation.py`, 395 lines of OpenCV mouse UI,
plus the 1035-line `auto_labels_segmentation.py`) as a headless session object
(the web UI in `serve/labeler_app.py` drives it; so can scripts):

  * per-image polygon store with class labels; polygon edit/move/rotate/copy
    (rotate +-5 degrees = the reference's n/b keys, `labels_segmentation.py`);
  * resume via a state file recording the current image index
    (`current_state.txt`, `labels_segmentation.py:157-169`);
  * saving writes THREE label formats at once — OBB polygon, pose
    (cxcywh + keypoints + visibility) and object (cxcywh)
    (`labels_segmentation.py:61-139`) — plus a review CSV of pixel coords
    (`kiem_tra.csv`, `:131-139`);
  * `auto_label`: run a Detector on the image and adopt detections as
    polygons ('s' key, `auto_labels_segmentation.py:263-302`);
  * `match_box`: manual bbox -> adopt the best-IoU (>0.3) detection
    ('m' key, `auto_labels_segmentation.py:808-871`);
  * navigation blocks while any polygon is unlabeled
    (`auto_labels_segmentation.py:873-907`).
"""

from __future__ import annotations

import dataclasses
import json
import math
import os

import numpy as np

from icp_slam_yolo_tpu.data.csvutil import comma_table
from icp_slam_yolo_tpu.data.labels import write_all_formats

UNLABELED = "none"


@dataclasses.dataclass
class Polygon:
    points: list[list[float]]          # pixel coords
    label: str = UNLABELED

    def center(self):
        p = np.asarray(self.points)
        return p.mean(axis=0)

    def rotate(self, degrees: float) -> None:
        """Rotate about the centroid (the reference's n/b +-5 degree keys)."""
        c = self.center()
        rad = math.radians(degrees)
        cs, sn = math.cos(rad), math.sin(rad)
        p = np.asarray(self.points) - c
        self.points = (np.stack([cs * p[:, 0] - sn * p[:, 1], sn * p[:, 0] + cs * p[:, 1]], axis=1) + c).tolist()

    def move(self, dx: float, dy: float) -> None:
        self.points = [[x + dx, y + dy] for x, y in self.points]

    def bbox(self):
        p = np.asarray(self.points)
        return [p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max()]


def _iou(a, b) -> float:
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


class LabelSession:
    """One labeling run over an image directory."""

    def __init__(self, image_dir: str, out_dir: str, classes: list[str] | None = None,
                 state_file: str | None = None):
        from icp_slam_yolo_tpu.io.yolo_data import find_pairs

        self.image_dir = image_dir
        self.out_dir = out_dir
        self.classes = classes or ["pallet"]
        self.images = [ip for ip, _ in find_pairs(image_dir)]
        if not self.images:
            raise FileNotFoundError(f"no images under {image_dir}")
        self.state_file = state_file or os.path.join(out_dir, "current_state.txt")
        self.annotations: dict[int, list[Polygon]] = {}
        self.index = 0
        self.clipboard: Polygon | None = None
        os.makedirs(out_dir, exist_ok=True)
        self._load_state()

    # --- resume (`current_state.txt` parity) -------------------------------
    def _load_state(self) -> None:
        if os.path.exists(self.state_file):
            try:
                data = json.loads(open(self.state_file).read())
                self.index = int(data.get("index", 0)) % len(self.images)
                for k, polys in data.get("annotations", {}).items():
                    self.annotations[int(k)] = [Polygon(**p) for p in polys]
            except (ValueError, json.JSONDecodeError):
                self.index = 0

    def save_state(self) -> None:
        data = {
            "index": self.index,
            "annotations": {
                str(k): [dataclasses.asdict(p) for p in v] for k, v in self.annotations.items()
            },
        }
        with open(self.state_file, "w") as f:
            json.dump(data, f)

    # --- polygon ops ---------------------------------------------------------
    @property
    def current(self) -> list[Polygon]:
        return self.annotations.setdefault(self.index, [])

    def add_polygon(self, points, label: str = UNLABELED) -> int:
        self.current.append(Polygon([list(map(float, p)) for p in points], label))
        return len(self.current) - 1

    def delete_polygon(self, i: int) -> None:
        del self.current[i]

    def set_label(self, i: int, label: str) -> None:
        self.current[i].label = label

    def copy_polygon(self, i: int) -> None:
        self.clipboard = Polygon([list(p) for p in self.current[i].points], self.current[i].label)

    def paste_polygon(self) -> int | None:
        if self.clipboard is None:
            return None
        return self.add_polygon(self.clipboard.points, self.clipboard.label)

    # --- navigation (blocked while any polygon is unlabeled) ------------------
    def can_navigate(self) -> bool:
        return all(p.label != UNLABELED for p in self.current)

    def next_image(self) -> bool:
        if not self.can_navigate():
            return False
        self.index = (self.index + 1) % len(self.images)
        self.save_state()
        return True

    def prev_image(self) -> bool:
        if not self.can_navigate():
            return False
        self.index = (self.index - 1) % len(self.images)
        self.save_state()
        return True

    # --- auto labeling ----------------------------------------------------------
    def auto_label(self, detector, default_label: str | None = None) -> int:
        """Run the detector on the current image; adopt detections as
        rectangle polygons ('s' key semantics)."""
        from PIL import Image

        img = np.asarray(Image.open(self.images[self.index]).convert("RGB"))
        out = detector(img)
        n = 0
        label = default_label or self.classes[0]
        for (x1, y1, x2, y2) in np.asarray(out["boxes"]).reshape(-1, 4):
            self.add_polygon([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], label)
            n += 1
        return n

    def auto_label_segment(self, seg_model_apply, img_size: int, default_label: str | None = None,
                           conf_threshold: float = 0.5, max_instances: int = 8) -> int:
        """Segmentation-assisted auto-label (`auto_labels_segmentation.py:76-94`):
        run a segment-task model, turn its instance masks into polygons scaled
        to image pixels, and adopt them as labeled polygons.

        ``seg_model_apply(images) -> (outs, protos)`` is a jitted forward of a
        `YOLO(task="segment")` model.
        """
        import numpy as np
        from PIL import Image

        import jax.numpy as jnp

        from icp_slam_yolo_tpu.models.segment import assemble_masks, mask_to_polygon
        from icp_slam_yolo_tpu.models.yolo import decode_predictions

        img = Image.open(self.images[self.index]).convert("RGB")
        w, h = img.size
        arr = np.asarray(img.resize((img_size, img_size)), np.float32) / 255.0
        outs, protos = seg_model_apply(jnp.asarray(arr[None]))
        boxes, scores, coefs = decode_predictions(outs, img_size)
        # NMS so overlapping anchors yield one instance each
        from icp_slam_yolo_tpu.ops.nms import best_class, nms

        conf, cls_idx = best_class(scores[0])
        dets = nms(boxes[0], conf, cls_idx, conf_threshold, 0.45, max_instances)
        keep_mask = np.asarray(dets.valid)
        if not keep_mask.any():
            return 0
        # recover the surviving anchors' coefficients by box identity
        det_boxes = np.asarray(dets.boxes)[keep_mask]
        all_boxes = np.asarray(boxes[0])
        anchor_ids = [int(np.argmin(np.abs(all_boxes - b).sum(1))) for b in det_boxes]
        masks = np.asarray(
            assemble_masks(protos[0], coefs[0][np.asarray(anchor_ids)], jnp.asarray(det_boxes), img_size)
        )
        sp = masks.shape[1]
        label = default_label or self.classes[0]
        n = 0
        for mask in masks:
            poly = mask_to_polygon(mask)
            if len(poly) < 3:
                continue
            scaled = poly / sp * np.array([w, h])
            self.add_polygon(scaled.tolist(), label)
            n += 1
        return n

    def match_box(self, bbox, detector, iou_threshold: float = 0.3) -> int | None:
        """Manual bbox -> adopt the best-matching detection (IoU > 0.3,
        'm' key semantics, `auto_labels_segmentation.py:808-871`)."""
        from PIL import Image

        img = np.asarray(Image.open(self.images[self.index]).convert("RGB"))
        out = detector(img)
        best, best_iou = None, iou_threshold
        for box in np.asarray(out["boxes"]).reshape(-1, 4):
            i = _iou(bbox, box)
            if i > best_iou:
                best, best_iou = box, i
        if best is None:
            return None
        x1, y1, x2, y2 = best
        return self.add_polygon([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], self.classes[0])

    # --- mask paintbrush (`labels_segmentation_ver_1/2/new.py` capability) -----
    def new_mask(self, width: int, height: int) -> np.ndarray:
        """Start a paint mask for the current image (brush-based labeling)."""
        self._mask = np.zeros((height, width), bool)
        return self._mask

    def paint(self, x: int, y: int, brush_size: int = 10, shape: str = "square",
              erase: bool = False) -> None:
        """Paint/erase with a sized square or circle brush (the reference's
        brush tools; erase = right-button drag)."""
        m = self._mask
        h, w = m.shape
        r = brush_size // 2
        y0, y1 = max(0, y - r), min(h, y + r + 1)
        x0, x1 = max(0, x - r), min(w, x + r + 1)
        if shape == "circle":
            yy, xx = np.mgrid[y0:y1, x0:x1]
            sel = (yy - y) ** 2 + (xx - x) ** 2 <= r * r
            m[y0:y1, x0:x1][sel] = not erase
        else:
            m[y0:y1, x0:x1] = not erase

    def mask_to_polygons(self, label: str | None = None, min_area: int = 20) -> int:
        """Convert painted regions to polygons (findContours step of the
        reference's paint labelers).  Returns polygons added."""
        from icp_slam_yolo_tpu.models.segment import mask_to_polygon

        m = self._mask
        # split into connected regions via the flood-fill labeler
        import collections

        labels_img = np.zeros(m.shape, np.int32)
        added = 0
        nxt = 0
        for y0, x0 in np.argwhere(m & (labels_img == 0)):
            if labels_img[y0, x0] or not m[y0, x0]:
                continue
            nxt += 1
            q = collections.deque([(y0, x0)])
            labels_img[y0, x0] = nxt
            cells = [(y0, x0)]
            while q:
                y, x = q.popleft()
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ny, nx_ = y + dy, x + dx
                    if 0 <= ny < m.shape[0] and 0 <= nx_ < m.shape[1] and m[ny, nx_] and not labels_img[ny, nx_]:
                        labels_img[ny, nx_] = nxt
                        cells.append((ny, nx_))
                        q.append((ny, nx_))
            if len(cells) < min_area:
                continue
            region = labels_img == nxt
            poly = mask_to_polygon(region.astype(float), max_points=24)
            if len(poly) >= 3:
                self.add_polygon(poly.tolist(), label or UNLABELED)
                added += 1
        return added

    # --- output (three formats at once + review CSV) ------------------------------
    def save_labels(self) -> int:
        from PIL import Image

        path = self.images[self.index]
        stem = os.path.splitext(os.path.basename(path))[0]
        w, h = Image.open(path).size
        dirs = {
            "obb": os.path.join(self.out_dir, "output"),
            "pose": os.path.join(self.out_dir, "output_pose"),
            "object": os.path.join(self.out_dir, "output_oject"),  # sic: reference dir name
        }
        # overwrite per image
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)
            fp = os.path.join(d, stem + ".txt")
            if os.path.exists(fp):
                os.remove(fp)
        review = comma_table(os.path.join(self.out_dir, "kiem_tra.csv"))
        n = 0
        for poly in self.current:
            if poly.label == UNLABELED:
                continue
            cls = self.classes.index(poly.label) if poly.label in self.classes else 0
            norm = [(x / w, y / h) for x, y in poly.points]
            write_all_formats(dirs, stem, cls, norm)
            review.append([stem, poly.label] + [f"{v:.1f}" for xy in poly.points for v in xy])
            n += 1
        self.save_state()
        return n
