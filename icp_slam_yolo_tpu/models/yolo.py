"""YOLOv8-family detector in Flax (linen), designed for TPU.

The reference delegates detection to Ultralytics PyTorch models — yolo12n
detect at 640 px (`train2/args.yaml`) and yolo11n-obb at 1024 px
(`runs/obb/train/args.yaml`) — called via `YOLO(weights).predict`
(`mainn.py:27,175-209`, `labels_segmentation/obb2.py:161-226`).  This is a
from-scratch JAX implementation of the v8-style architecture (CSP backbone
with C2f blocks, SPPF, PAN-FPN neck, decoupled anchor-free head with
distribution-focal-loss box regression), which matches those models'
capability class: single-class pallet detection with axis-aligned or oriented
boxes.

TPU notes: NHWC layout (XLA's native conv layout), SiLU activations fuse into
the convs, all shapes static, inference runs in bfloat16 with float32 params
by default (`compute_dtype`).  Decode + NMS are in-graph (`ops/nms.py`) so a
camera frame -> boxes is one compiled program.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _make_divisible(x: float, div: int = 8) -> int:
    return max(div, int(round(x / div) * div))


class ConvBnAct(nn.Module):
    """Conv + BatchNorm + SiLU — the reference stack's basic block."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=self.kernel // 2,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnAct(self.features, 3, dtype=self.dtype)(x, train)
        y = ConvBnAct(self.features, 3, dtype=self.dtype)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (v8's replacement for C3)."""

    features: int
    n: int = 1
    shortcut: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvBnAct(2 * c, 1, dtype=self.dtype)(x, train)
        parts = [y[..., :c], y[..., c:]]
        for _ in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, dtype=self.dtype)(parts[-1], train))
        return ConvBnAct(self.features, 1, dtype=self.dtype)(jnp.concatenate(parts, axis=-1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max-pools."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        x = ConvBnAct(c, 1, dtype=self.dtype)(x, train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        return ConvBnAct(self.features, 1, dtype=self.dtype)(jnp.concatenate([x, p1, p2, p3], axis=-1), train)


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


class DetectHead(nn.Module):
    """Decoupled anchor-free head with DFL box regression (reg_max bins)."""

    num_classes: int
    reg_max: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = []
        c2 = max(16, feats[0].shape[-1] // 4, self.reg_max * 4)
        c3 = max(feats[0].shape[-1], min(self.num_classes, 100))
        for f in feats:
            box = ConvBnAct(c2, 3, dtype=self.dtype)(f, train)
            box = ConvBnAct(c2, 3, dtype=self.dtype)(box, train)
            box = nn.Conv(4 * self.reg_max, (1, 1), dtype=self.dtype)(box)
            cls = ConvBnAct(c3, 3, dtype=self.dtype)(f, train)
            cls = ConvBnAct(c3, 3, dtype=self.dtype)(cls, train)
            cls = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                          bias_init=nn.initializers.constant(-4.6))(cls)  # prior p~0.01
            outs.append((box, cls))
        return outs


class OBBHead(DetectHead):
    """Adds a per-anchor rotation-angle branch (yolo11-obb capability,
    `runs/obb/train/args.yaml`); angle in (-pi/4, 3pi/4) via sigmoid scaling."""

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = super().__call__(feats, train)
        full = []
        c4 = max(feats[0].shape[-1] // 4, 16)
        for f, (box, cls) in zip(feats, outs):
            ang = ConvBnAct(c4, 3, dtype=self.dtype)(f, train)
            ang = nn.Conv(1, (1, 1), dtype=self.dtype)(ang)
            full.append((box, cls, ang))
        return full


class SegmentHead(DetectHead):
    """Adds per-anchor mask coefficients (v8-seg capability — the reference's
    auto-labeler consumes `r.masks.data` from a seg model,
    `auto_labels_segmentation.py:76-94`).  Masks are assembled as
    ``sigmoid(protos @ coeffs)`` by `models/segment.assemble_masks`."""

    n_coeffs: int = 32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = super().__call__(feats, train)
        full = []
        c4 = max(feats[0].shape[-1] // 4, self.n_coeffs)
        for f, (box, cls) in zip(feats, outs):
            mc = ConvBnAct(c4, 3, dtype=self.dtype)(f, train)
            mc = nn.Conv(self.n_coeffs, (1, 1), dtype=self.dtype)(mc)
            full.append((box, cls, mc))
        return full


class Proto(nn.Module):
    """Prototype-mask net from the P3 feature: conv -> 2x upsample -> conv ->
    ``n_protos`` mask bases at 1/4 input resolution."""

    n_protos: int = 32
    mid: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, p3, train: bool = False):
        x = ConvBnAct(self.mid, 3, dtype=self.dtype)(p3, train)
        x = _upsample2(x)
        x = ConvBnAct(self.mid, 3, dtype=self.dtype)(x, train)
        return nn.Conv(self.n_protos, (1, 1), dtype=self.dtype)(x)


class YOLO(nn.Module):
    """v8-style detector.  ``variant``: n/s/m scale; ``task``: detect | obb."""

    num_classes: int = 1
    variant: str = "n"
    task: str = "detect"
    reg_max: int = 16
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        depth, width = {"n": (0.33, 0.25), "s": (0.33, 0.5), "m": (0.67, 0.75)}[self.variant]
        ch = [_make_divisible(c * width) for c in (64, 128, 256, 512, 1024)]
        ch[4] = min(ch[4], _make_divisible(1024 * width))
        n1 = max(round(3 * depth), 1)
        n2 = max(round(6 * depth), 1)
        self._ch = ch
        self._n1, self._n2 = n1, n2
        dt = self.compute_dtype
        self.stem = ConvBnAct(ch[0], 3, 2, dtype=dt)
        self.down2 = ConvBnAct(ch[1], 3, 2, dtype=dt)
        self.c2f_2 = C2f(ch[1], n1, True, dtype=dt)
        self.down3 = ConvBnAct(ch[2], 3, 2, dtype=dt)
        self.c2f_3 = C2f(ch[2], n2, True, dtype=dt)
        self.down4 = ConvBnAct(ch[3], 3, 2, dtype=dt)
        self.c2f_4 = C2f(ch[3], n2, True, dtype=dt)
        self.down5 = ConvBnAct(ch[4], 3, 2, dtype=dt)
        self.c2f_5 = C2f(ch[4], n1, True, dtype=dt)
        self.sppf = SPPF(ch[4], dtype=dt)
        # PAN neck
        self.neck_p4 = C2f(ch[3], n1, False, dtype=dt)
        self.neck_p3 = C2f(ch[2], n1, False, dtype=dt)
        self.pan_d3 = ConvBnAct(ch[2], 3, 2, dtype=dt)
        self.pan_p4 = C2f(ch[3], n1, False, dtype=dt)
        self.pan_d4 = ConvBnAct(ch[3], 3, 2, dtype=dt)
        self.pan_p5 = C2f(ch[4], n1, False, dtype=dt)
        if self.task == "obb":
            self.head = OBBHead(self.num_classes, self.reg_max, dtype=dt)
        elif self.task == "segment":
            self.head = SegmentHead(self.num_classes, self.reg_max, dtype=dt)
            self.proto = Proto(dtype=dt)
        else:
            self.head = DetectHead(self.num_classes, self.reg_max, dtype=dt)

    def __call__(self, images, train: bool = False):
        """images: ``(B, H, W, 3)`` float in [0, 1]; H, W divisible by 32.

        Returns the per-level raw head outputs (decode with `decode_predictions`).
        """
        x = images.astype(self.compute_dtype)
        x = self.stem(x, train)
        x = self.down2(x, train)
        x = self.c2f_2(x, train)
        x = self.down3(x, train)
        p3 = self.c2f_3(x, train)
        x = self.down4(p3, train)
        p4 = self.c2f_4(x, train)
        x = self.down5(p4, train)
        x = self.c2f_5(x, train)
        p5 = self.sppf(x, train)

        u4 = jnp.concatenate([_upsample2(p5), p4], axis=-1)
        n4 = self.neck_p4(u4, train)
        u3 = jnp.concatenate([_upsample2(n4), p3], axis=-1)
        n3 = self.neck_p3(u3, train)
        d3 = jnp.concatenate([self.pan_d3(n3, train), n4], axis=-1)
        o4 = self.pan_p4(d3, train)
        d4 = jnp.concatenate([self.pan_d4(o4, train), p5], axis=-1)
        o5 = self.pan_p5(d4, train)
        outs = self.head([n3, o4, o5], train)
        if self.task == "segment":
            return outs, self.proto(n3, train)
        return outs


STRIDES = (8, 16, 32)


def make_anchors(img_size: int, strides=STRIDES):
    """Anchor-free grid centres per level: ``(A, 2)`` xy in pixels and ``(A,)`` stride."""
    pts, strs = [], []
    for s in strides:
        n = img_size // s
        yy, xx = jnp.meshgrid(jnp.arange(n), jnp.arange(n), indexing="ij")
        centers = (jnp.stack([xx, yy], axis=-1).reshape(-1, 2) + 0.5) * s
        pts.append(centers.astype(jnp.float32))
        strs.append(jnp.full(n * n, s, jnp.float32))
    return jnp.concatenate(pts), jnp.concatenate(strs)


def dfl_decode(box_logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """Distribution-focal decode: ``(..., 4*reg_max)`` -> expected ltrb distances."""
    shape = box_logits.shape[:-1]
    logits = box_logits.reshape(*shape, 4, reg_max)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(probs * bins, axis=-1)  # (..., 4)


def decode_predictions(outs, img_size: int, reg_max: int = 16):
    """Head outputs -> flat per-anchor ``(boxes_xyxy, scores, extras)``.

    boxes in pixels; scores are per-class sigmoid probabilities ``(B, A, C)``.
    For OBB heads, extras is the rotation angle per anchor ``(B, A)``; else None.
    """
    anchors, strides = make_anchors(img_size)
    boxes, scores, extras_l = [], [], []
    a0 = 0
    for out in outs:
        box_l, cls_l = out[0], out[1]
        b, h, w, _ = box_l.shape
        n = h * w
        ltrb = dfl_decode(box_l.reshape(b, n, 4 * reg_max), reg_max)
        anc = anchors[a0 : a0 + n]
        stri = strides[a0 : a0 + n]
        a0 += n
        xy1 = anc[None] - ltrb[..., :2] * stri[None, :, None]
        xy2 = anc[None] + ltrb[..., 2:] * stri[None, :, None]
        boxes.append(jnp.concatenate([xy1, xy2], axis=-1))
        scores.append(jax.nn.sigmoid(cls_l.reshape(b, n, -1).astype(jnp.float32)))
        if len(out) == 3:
            extra = out[2]
            if extra.shape[-1] == 1:  # OBB: rotation angle in (-pi/4, 3pi/4)
                extras_l.append(
                    (jax.nn.sigmoid(extra.reshape(b, n).astype(jnp.float32)) - 0.25) * math.pi
                )
            else:  # segment: mask coefficients (B, A, P)
                extras_l.append(extra.reshape(b, n, -1).astype(jnp.float32))
    boxes = jnp.concatenate(boxes, axis=1)
    scores = jnp.concatenate(scores, axis=1)
    extras = jnp.concatenate(extras_l, axis=1) if extras_l else None
    return boxes, scores, extras
