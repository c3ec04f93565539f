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

from icp_slam_yolo_tpu.models.yolo import YOLO, decode_topk
from icp_slam_yolo_tpu.ops.nms import Detections, suppress


def detector_from_checkpoint(
    path: str,
    conf_threshold: float = 0.5,
    iou_threshold: float = 0.45,
    compute_dtype=jnp.bfloat16,
    img_size: int | None = None,
    fold_bn: bool = True,
    pallas_convs: bool = False,
) -> "Detector":
    """Build a ``Detector`` from a checkpoint, honouring its metadata
    (task/family/variant/n_kpt/img_size/num_classes) — loading an OBB, segment
    or pose checkpoint must instantiate the matching head, not the default
    detect head."""
    if path.endswith(".pt"):
        # Ultralytics torch checkpoint (`train2/args.yaml:3` yolo12n.pt-style):
        # name-mapped import, v8-family layouts only (io/torch_import.py)
        from icp_slam_yolo_tpu.io.torch_import import load_ultralytics_pt

        params, batch_stats = load_ultralytics_pt(path)
        payload = {"params": params, "batch_stats": batch_stats}
        meta = {"family": "v8", "task": "detect"}
    else:
        from icp_slam_yolo_tpu.io.checkpoint import load_checkpoint

        payload, _, meta = load_checkpoint(path)
    return Detector(
        num_classes=meta.get("num_classes", 1),
        variant=meta.get("variant", "n"),
        task=meta.get("task", "detect"),
        family=meta.get("family", "v8"),
        img_size=img_size or meta.get("img_size", 640),
        n_kpt=meta.get("n_kpt", 4),
        conf_threshold=conf_threshold,
        iou_threshold=iou_threshold,
        params=payload,
        compute_dtype=compute_dtype,
        fold_bn=fold_bn,
        pallas_convs=pallas_convs,
    )


class Detector:
    """Stateful wrapper owning model params; ``__call__`` runs frame -> Detections."""

    def __init__(
        self,
        num_classes: int = 1,
        variant: str = "n",
        task: str = "detect",
        family: str = "v8",
        img_size: int = 640,
        conf_threshold: float = 0.5,   # `mainn.py:175` conf=0.5
        iou_threshold: float = 0.45,
        max_detections: int = 100,
        params=None,
        seed: int = 0,
        compute_dtype=jnp.bfloat16,  # MXU-native inference default; pass jnp.float32 to opt out
        n_kpt: int = 4,
        fold_bn: bool = True,  # fold BatchNorm affines into conv kernels at
        # load time: the same inference function with one elementwise op and
        # one HBM round trip fewer per block (XLA measurably does not fuse
        # the BN chain into the conv — scripts/detect_roofline.py).  Pass
        # False to run the training-shaped graph.
        pallas_convs: bool = True,  # run the conv stack as fused Pallas
        # kernels (conv+bias+SiLU one kernel each; n=1 C2f blocks as ONE
        # megakernel) in the latency regime — measured 1.7x (b2 stereo tick)
        # to 3.75x (b8) end-to-end, self-disabling above batch 32 where the
        # XLA emitter wins (docs/PERF.md r5).  Requires fold_bn.
    ):
        self.model = YOLO(num_classes=num_classes, variant=variant, task=task, family=family,
                          n_kpt=n_kpt, compute_dtype=compute_dtype, fold_bn=fold_bn)
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
            if fold_bn:
                from icp_slam_yolo_tpu.models.yolo import fold_batchnorm

                self.params, self.batch_stats = fold_batchnorm(self.params, self.batch_stats)
        self.pallas_convs = pallas_convs and fold_bn
        self._c2f_arranged = self._arrange_c2f_blocks() if self.pallas_convs else {}
        self._predict = jax.jit(partial(self._predict_impl))

    def _arrange_c2f_blocks(self) -> dict:
        """Precompute the megakernel weight arrangement for every supported
        (folded, n=1) C2f block ONCE, host-side: built in-trace per call the
        ~10^2 scatter ops per block cost 2.5x what the kernel saves
        (docs/PERF.md r5).  Keys are the block names the interceptor sees via
        ``module.path``; shortcut comes from the v8 wiring (backbone c2f_*
        carry the residual, neck_*/pan_* do not — models/yolo.py setup)."""
        import numpy as _np

        from icp_slam_yolo_tpu.ops.pallas.c2f_fused import arrange_c2f_weights
        from icp_slam_yolo_tpu.ops.pallas.conv_fused import _pack_group

        cache = {}
        for name, sub in self.params.items():
            if not (isinstance(sub, dict) and "Bottleneck_0" in sub
                    and "Bottleneck_1" not in sub
                    and "ConvBnAct_0" in sub and "ConvBnAct_1" in sub):
                continue
            try:
                cv1 = sub["ConvBnAct_0"]["Conv_0"]
                m0a = sub["Bottleneck_0"]["ConvBnAct_0"]["Conv_0"]
                m0b = sub["Bottleneck_0"]["ConvBnAct_1"]["Conv_0"]
                cv2 = sub["ConvBnAct_1"]["Conv_0"]
                w1 = _np.asarray(cv1["kernel"])[0, 0]
                b1 = _np.asarray(cv1["bias"])
            except (KeyError, TypeError, IndexError):
                continue  # unfolded or non-C2f-shaped subtree
            c = w1.shape[1] // 2
            arranged = tuple(
                _np.asarray(a) for a in arrange_c2f_weights(
                    w1, b1,
                    _np.asarray(m0a["kernel"]), _np.asarray(m0a["bias"]),
                    _np.asarray(m0b["kernel"]), _np.asarray(m0b["bias"]),
                    _np.asarray(cv2["kernel"])[0, 0], _np.asarray(cv2["bias"]),
                    _pack_group(c, c), self.model.compute_dtype,
                )
            )
            cache[name] = (arranged, name.startswith("c2f"))
        return cache

    def _apply_model(self, variables, images):
        if self.pallas_convs:
            import flax.linen as nn

            from icp_slam_yolo_tpu.ops.pallas.c2f_fused import c2f_interceptor
            from icp_slam_yolo_tpu.ops.pallas.conv_fused import pallas_cba_interceptor

            def fused_blocks(next_fun, args, kwargs, context):
                # whole-C2f megakernel first; a fallen-through C2f's inner
                # ConvBnActs still get the per-site fusion
                def nxt(*a, **k):
                    return pallas_cba_interceptor(next_fun, a, k, context)
                return c2f_interceptor(nxt, args, kwargs, context,
                                       cache=self._c2f_arranged)

            with nn.intercept_methods(fused_blocks):
                return self.model.apply(variables, images, train=False)
        return self.model.apply(variables, images, train=False)

    def _predict_impl(self, params, batch_stats, images, conf_threshold, iou_threshold):
        variables = {"params": params, "batch_stats": batch_stats}
        outs = self._apply_model(variables, images)
        protos = None
        if self.task == "segment":
            outs, protos = outs  # (head outputs, (B, Hp, Wp, P) mask bases)

        # top-K before the per-anchor decode (same candidates, fewer
        # full-anchor passes — `decode_topk`), then the fixpoint suppression
        # directly on the pre-sorted K.  extras come back row-aligned with
        # the Detections (only the K winners are ever decoded).
        n_anchors = sum(int(o[0].shape[1] * o[0].shape[2]) for o in outs)
        k = min(self.max_detections, n_anchors)
        boxes, scores, classes, idx, extras = decode_topk(
            outs, self.img_size, k, task=self.task
        )
        dets = jax.vmap(partial(suppress, iou_threshold=iou_threshold))(
            boxes, scores, classes, idx, scores >= conf_threshold
        )
        return dets, extras, protos

    def preprocess(self, frame: np.ndarray):
        """HWC uint8/float frame -> ``(1, S, S, 3)`` float32 [0, 1], letterboxed.

        Ultralytics-style aspect-preserving resize + centred 114-gray pad
        (the previous stretch resize distorted 640x480 frames by 33%).
        Returns ``(batch, (scale, pad_x, pad_y))``; the exact unmap for a
        model-space coordinate is ``(v - pad) / scale``.
        """
        from icp_slam_yolo_tpu.io.yolo_data import LETTERBOX_FILL, letterbox_transform

        img = np.asarray(frame)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        h, w = img.shape[:2]
        s = self.img_size
        scale, px, py = letterbox_transform(w, h, s)
        nw, nh = round(w * scale), round(h * scale)
        # nearest-index resample (no PIL dependency on the hot serving path)
        yi = ((np.arange(nh) + 0.5) / scale - 0.5).round().astype(np.int32).clip(0, h - 1)
        xi = ((np.arange(nw) + 0.5) / scale - 0.5).round().astype(np.int32).clip(0, w - 1)
        out = np.full((s, s, 3), LETTERBOX_FILL, np.float32)
        x0, y0 = int(round(px)), int(round(py))
        out[y0 : y0 + nh, x0 : x0 + nw] = img[yi][:, xi, :3]
        return out[None], (scale, px, py)

    def __call__(self, frame: np.ndarray) -> dict:
        """``detect(frame) -> boxes`` (BASELINE.json public API).

        Returns dict with ``boxes`` (N, 4) xyxy in ORIGINAL frame pixels,
        ``scores``, ``classes`` — N = number of valid detections.
        """
        batch, (scale, px, py) = self.preprocess(frame)
        dets, extras, protos = self._predict(
            self.params, self.batch_stats, jnp.asarray(batch),
            jnp.float32(self.conf_threshold), jnp.float32(self.iou_threshold),
        )
        return self._postprocess_one(dets, extras, protos, 0, scale, px, py)

    def detect_pair(self, f1: np.ndarray, f2: np.ndarray) -> tuple[dict, dict]:
        """Stereo-pair detect: BOTH eyes in ONE batch-2 device call.

        The reference's camera worker runs `model.predict` twice per tick
        (`mainn.py:175-176`); two sequential batch-1 dispatches cost ~2x the
        batched pair (bench_fused detect-b2 = 1.36 ms vs ~2 x 1 ms single).
        Frames must share a shape (stereo rigs do).
        """
        b1, (s1, px1, py1) = self.preprocess(f1)
        b2, (s2, px2, py2) = self.preprocess(f2)
        dets, extras, protos = self._predict(
            self.params, self.batch_stats, jnp.asarray(np.concatenate([b1, b2], 0)),
            jnp.float32(self.conf_threshold), jnp.float32(self.iou_threshold),
        )
        return (
            self._postprocess_one(dets, extras, protos, 0, s1, px1, py1),
            self._postprocess_one(dets, extras, protos, 1, s2, px2, py2),
        )

    def _postprocess_one(self, dets, extras, protos, i: int, scale, px, py) -> dict:
        valid = np.asarray(dets.valid[i])
        model_boxes = np.asarray(dets.boxes[i])[valid]
        # exact letterbox unmap to original frame pixels
        boxes = (model_boxes - np.array([px, py, px, py], np.float32)) / np.float32(scale)
        out = {
            "boxes": boxes,
            "scores": np.asarray(dets.scores[i])[valid],
            "classes": np.asarray(dets.classes[i])[valid],
        }
        if extras is not None:
            # extras rows are candidate-row-aligned with the Detections
            # (decode_topk), so each gathered row corresponds to the same row
            # of out["boxes"] directly
            gathered = np.asarray(extras[i])[valid]
            if self.task == "pose":
                # ordered tl/tr/br/bl corners unmapped to ORIGINAL frame px —
                # directly consumable by `stereo_to_3d`/`estimate_3d_pose`
                gathered = gathered.copy()
                gathered[..., 0] = (gathered[..., 0] - px) / scale
                gathered[..., 1] = (gathered[..., 1] - py) / scale
                out["keypoints"] = gathered  # (N, K, 3) [x, y, vis]
            else:
                out["angles" if self.task == "obb" else "mask_coeffs"] = gathered
        if protos is not None:
            from icp_slam_yolo_tpu.models.segment import assemble_masks

            out["masks"] = np.asarray(
                assemble_masks(
                    protos[i], jnp.asarray(out["mask_coeffs"]).reshape(-1, protos.shape[-1]),
                    jnp.asarray(model_boxes).reshape(-1, 4), self.img_size,
                )
            )  # (K, Hp, Wp) probabilities at 1/4 model resolution
        return out

    def predict_batch(self, images: jnp.ndarray) -> Detections:
        """Jitted path for already-preprocessed ``(B, S, S, 3)`` batches.
        Thresholds are traced arguments, so mutating ``conf_threshold`` (e.g.
        for an AP sweep) takes effect without retracing."""
        dets, _, _ = self._predict(
            self.params, self.batch_stats, images,
            jnp.float32(self.conf_threshold), jnp.float32(self.iou_threshold),
        )
        return dets
