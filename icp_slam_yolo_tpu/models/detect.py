"""Host-facing detector: ``detect(frame) -> boxes`` as one compiled program.

Mirrors the reference's camera worker usage (`mainn.py:175-209`): per frame,
predict -> confidence filter -> first/best boxes.  Here preprocessing (resize +
normalise), the conv forward, DFL decode and NMS are a single jitted function.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.models.yolo import YOLO, decode_predictions
from icp_slam_yolo_tpu.ops.nms import Detections, best_class, nms


class Detector:
    """Stateful wrapper owning model params; ``__call__`` runs frame -> Detections."""

    def __init__(
        self,
        num_classes: int = 1,
        variant: str = "n",
        task: str = "detect",
        img_size: int = 640,
        conf_threshold: float = 0.5,   # `mainn.py:175` conf=0.5
        iou_threshold: float = 0.45,
        max_detections: int = 100,
        params=None,
        seed: int = 0,
        compute_dtype=jnp.float32,
    ):
        self.model = YOLO(num_classes=num_classes, variant=variant, task=task, compute_dtype=compute_dtype)
        self.img_size = img_size
        self.task = task
        self.conf_threshold = conf_threshold
        self.iou_threshold = iou_threshold
        self.max_detections = max_detections
        if params is None:
            dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
            variables = self.model.init(jax.random.key(seed), dummy)
            self.params = variables["params"]
            self.batch_stats = variables.get("batch_stats", {})
        else:
            self.params = params["params"] if "params" in params else params
            self.batch_stats = params.get("batch_stats", {})
        self._predict = jax.jit(partial(self._predict_impl))

    def _predict_impl(self, params, batch_stats, images, conf_threshold, iou_threshold):
        variables = {"params": params, "batch_stats": batch_stats}
        outs = self.model.apply(variables, images, train=False)
        boxes, scores, extras = decode_predictions(outs, self.img_size)

        def one(b, s):
            conf, cls = best_class(s)
            return nms(b, conf, cls, conf_threshold, iou_threshold, self.max_detections)

        dets = jax.vmap(one)(boxes, scores)
        return dets, extras

    def preprocess(self, frame: np.ndarray) -> np.ndarray:
        """HWC uint8/float BGR-or-RGB frame -> ``(1, S, S, 3)`` float32 [0, 1].
        Nearest resize (geometry handled by scale factors returned alongside)."""
        img = np.asarray(frame)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        h, w = img.shape[:2]
        s = self.img_size
        yi = (np.arange(s) * (h / s)).astype(np.int32).clip(0, h - 1)
        xi = (np.arange(s) * (w / s)).astype(np.int32).clip(0, w - 1)
        resized = img[yi][:, xi, :3]
        return resized[None], (w / s, h / s)

    def __call__(self, frame: np.ndarray) -> dict:
        """``detect(frame) -> boxes`` (BASELINE.json public API).

        Returns dict with ``boxes`` (N, 4) xyxy in ORIGINAL frame pixels,
        ``scores``, ``classes`` — N = number of valid detections.
        """
        batch, (sx, sy) = self.preprocess(frame)
        dets, extras = self._predict(
            self.params, self.batch_stats, jnp.asarray(batch),
            jnp.float32(self.conf_threshold), jnp.float32(self.iou_threshold),
        )
        valid = np.asarray(dets.valid[0])
        boxes = np.asarray(dets.boxes[0])[valid]
        boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
        out = {
            "boxes": boxes,
            "scores": np.asarray(dets.scores[0])[valid],
            "classes": np.asarray(dets.classes[0])[valid],
        }
        if extras is not None:
            out["angles"] = np.asarray(extras[0])
        return out

    def predict_batch(self, images: jnp.ndarray) -> Detections:
        """Jitted path for already-preprocessed ``(B, S, S, 3)`` batches.
        Thresholds are traced arguments, so mutating ``conf_threshold`` (e.g.
        for an AP sweep) takes effect without retracing."""
        dets, _ = self._predict(
            self.params, self.batch_stats, images,
            jnp.float32(self.conf_threshold), jnp.float32(self.iou_threshold),
        )
        return dets
