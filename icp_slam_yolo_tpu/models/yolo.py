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
    """Conv + BatchNorm + SiLU — the reference stack's basic block.

    ``folded=True`` is the inference-only BN-folded form: one biased conv +
    SiLU, mathematically identical once the BN affine is absorbed into the
    kernel/bias (`fold_batchnorm`).  XLA does NOT reliably fuse the BN
    elementwise chain into the conv (measured b128 detect FPS sits at ~97% of
    the roofline that charges every BN an HBM round trip — see
    scripts/detect_roofline.py), so removing the op from the graph removes
    real traffic."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=self.kernel // 2,
            use_bias=self.folded,
            dtype=self.dtype,
        )(x)
        if not self.folded:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype)(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnAct(self.features, 3, dtype=self.dtype, folded=self.folded)(x, train)
        y = ConvBnAct(self.features, 3, dtype=self.dtype, folded=self.folded)(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (v8's replacement for C3)."""

    features: int
    n: int = 1
    shortcut: bool = False
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvBnAct(2 * c, 1, dtype=self.dtype, folded=self.folded)(x, train)
        parts = [y[..., :c], y[..., c:]]
        for _ in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, dtype=self.dtype, folded=self.folded)(parts[-1], train))
        return ConvBnAct(self.features, 1, dtype=self.dtype, folded=self.folded)(jnp.concatenate(parts, axis=-1), train)


class C3k(nn.Module):
    """CSP block with 3 convs and ``n`` hidden-width bottlenecks (the inner
    module of v11's C3k2 when ``c3k=True``)."""

    features: int
    n: int = 2
    e: float = 0.5
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = max(8, int(self.features * self.e))
        a = ConvBnAct(c, 1, dtype=self.dtype, folded=self.folded)(x, train)
        b = ConvBnAct(c, 1, dtype=self.dtype, folded=self.folded)(x, train)
        for _ in range(self.n):
            a = Bottleneck(c, True, dtype=self.dtype, folded=self.folded)(a, train)
        return ConvBnAct(self.features, 1, dtype=self.dtype, folded=self.folded)(
            jnp.concatenate([a, b], axis=-1), train
        )


class C3k2(nn.Module):
    """v11/v12 CSP block: the C2f wiring with either plain bottlenecks or C3k
    inner modules (yolo11/yolo12 backbone+neck staple; the reference's trained
    models are yolo12n `train2/args.yaml:1` and yolo11n-obb
    `runs/obb/train/args.yaml`)."""

    features: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = max(8, int(self.features * self.e))
        y = ConvBnAct(2 * c, 1, dtype=self.dtype, folded=self.folded)(x, train)
        parts = [y[..., :c], y[..., c:]]
        for _ in range(self.n):
            if self.c3k:
                parts.append(C3k(c, 2, dtype=self.dtype, folded=self.folded)(parts[-1], train))
            else:
                parts.append(Bottleneck(c, True, dtype=self.dtype, folded=self.folded)(parts[-1], train))
        return ConvBnAct(self.features, 1, dtype=self.dtype, folded=self.folded)(
            jnp.concatenate(parts, axis=-1), train
        )


class Attention2d(nn.Module):
    """Multi-head self-attention over an NHWC map, optionally partitioned into
    ``area`` horizontal bands (yolo12's "area attention": full attention cost
    divided by ``area`` with static shapes — no windows, no masks, TPU-exact).

    Matmuls accumulate in f32 and the softmax runs in f32 regardless of
    ``compute_dtype`` (bf16 logits are fine; bf16 softmax accumulation is not).
    Follows the Ultralytics attention shape: per-head query/key width is half
    the value width, plus a 3x3 depthwise positional conv on V.
    """

    num_heads: int
    area: int = 1
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        kd = max(hd // 2, 8)
        q = nn.Conv(nh * kd, (1, 1), use_bias=False, dtype=self.dtype)(x)
        k = nn.Conv(nh * kd, (1, 1), use_bias=False, dtype=self.dtype)(x)
        v = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)(x)
        # positional term: 3x3 depthwise conv on V in map space
        pe = nn.Conv(c, (3, 3), padding=1, feature_group_count=c, use_bias=False,
                     dtype=self.dtype)(v)

        n = h * w
        area = self.area if n % self.area == 0 else 1
        t = n // area

        def split(z, d):  # (B,H,W,nh*d) -> (B*area*nh, T, d)
            z = z.reshape(b, area, t, nh, d)
            return z.transpose(0, 1, 3, 2, 4).reshape(b * area * nh, t, d)

        qs, ks, vs = split(q, kd), split(k, kd), split(v, hd)
        logits = jnp.einsum(
            "bnd,bmd->bnm", qs, ks, preferred_element_type=jnp.float32
        ) * (kd ** -0.5)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vs.dtype)
        out = jnp.einsum("bnm,bmd->bnd", attn, vs, preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).reshape(b, area, nh, t, hd)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, h, w, c)
        return nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)(out + pe)


class PSABlock(nn.Module):
    """Attention + conv-FFN residual pair (v11's position-sensitive attention)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + Attention2d(max(self.features // 64, 1), dtype=self.dtype)(x)
        y = ConvBnAct(self.features * 2, 1, dtype=self.dtype, folded=self.folded)(x, train)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype)(y)
        return x + y


class C2PSA(nn.Module):
    """CSP-wrapped PSA stack after SPPF (yolo11 backbone tail)."""

    features: int
    n: int = 1
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        y = ConvBnAct(2 * c, 1, dtype=self.dtype, folded=self.folded)(x, train)
        a, bpart = y[..., :c], y[..., c:]
        for _ in range(self.n):
            a = PSABlock(c, dtype=self.dtype, folded=self.folded)(a, train)
        return ConvBnAct(self.features, 1, dtype=self.dtype, folded=self.folded)(
            jnp.concatenate([a, bpart], axis=-1), train
        )


class ABlock(nn.Module):
    """Area-attention block: A2 attention + 1.2x conv-MLP, both residual
    (yolo12's attention primitive)."""

    features: int
    area: int = 1
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + Attention2d(max(self.features // 32, 1), self.area, dtype=self.dtype)(x)
        mid = max(8, int(self.features * 1.2))
        y = ConvBnAct(mid, 1, dtype=self.dtype, folded=self.folded)(x, train)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                         dtype=self.dtype)(y)
        return x + y


class A2C2f(nn.Module):
    """yolo12's R-ELAN-style block: C2f wiring whose inner modules are pairs
    of area-attention blocks (``a2=True``) or C3k blocks (``a2=False``), with
    a learned residual scale when shapes allow."""

    features: int
    n: int = 1
    a2: bool = True
    area: int = 1
    e: float = 0.5
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = max(8, int(self.features * self.e))
        y = ConvBnAct(c, 1, dtype=self.dtype, folded=self.folded)(x, train)
        parts = [y]
        for _ in range(self.n):
            z = parts[-1]
            if self.a2:
                z = ABlock(c, self.area, dtype=self.dtype, folded=self.folded)(z, train)
                z = ABlock(c, self.area, dtype=self.dtype, folded=self.folded)(z, train)
            else:
                z = C3k(c, 2, dtype=self.dtype, folded=self.folded)(z, train)
            parts.append(z)
        out = ConvBnAct(self.features, 1, dtype=self.dtype, folded=self.folded)(
            jnp.concatenate(parts, axis=-1), train
        )
        if self.a2 and x.shape[-1] == self.features:
            gamma = self.param("gamma", nn.initializers.constant(0.01), (self.features,))
            return x + gamma.astype(out.dtype) * out
        return out


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max-pools."""

    features: int
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features // 2
        x = ConvBnAct(c, 1, dtype=self.dtype, folded=self.folded)(x, train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        return ConvBnAct(self.features, 1, dtype=self.dtype, folded=self.folded)(jnp.concatenate([x, p1, p2, p3], axis=-1), train)


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")


class DetectHead(nn.Module):
    """Decoupled anchor-free head with DFL box regression (reg_max bins)."""

    num_classes: int
    reg_max: int = 16
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = []
        c2 = max(16, feats[0].shape[-1] // 4, self.reg_max * 4)
        c3 = max(feats[0].shape[-1], min(self.num_classes, 100))
        for f in feats:
            box = ConvBnAct(c2, 3, dtype=self.dtype, folded=self.folded)(f, train)
            box = ConvBnAct(c2, 3, dtype=self.dtype, folded=self.folded)(box, train)
            box = nn.Conv(4 * self.reg_max, (1, 1), dtype=self.dtype)(box)
            cls = ConvBnAct(c3, 3, dtype=self.dtype, folded=self.folded)(f, train)
            cls = ConvBnAct(c3, 3, dtype=self.dtype, folded=self.folded)(cls, train)
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
            ang = ConvBnAct(c4, 3, dtype=self.dtype, folded=self.folded)(f, train)
            ang = nn.Conv(1, (1, 1), dtype=self.dtype)(ang)
            full.append((box, cls, ang))
        return full


class PoseHead(DetectHead):
    """Adds a per-anchor keypoint branch: ``n_kpt`` ordered keypoints, each
    ``(dx, dy, visibility-logit)`` — v8-pose capability.

    The reference's labeler writes exactly this ground truth (pose rows
    ``class cx cy w h + 4x(x y vis)``, `labels_segmentation.py:107-112`,
    799 labeled frames in `output_pose/`) but never trains on it; its corner
    ordering is consistent (top-left, top-right, bottom-right, bottom-left —
    the same tl/tr/br/bl naming `obb2.py:7-104` reconstructs by sorting), so
    a pose model yields ORDERED pallet corners directly: one frame -> the 4
    corner correspondences that `stereo_to_3d` (`img.py:3-14`) and the PnP
    pose solver (`obb2.py:105-126`) need, with no corner-sorting heuristics.

    Decode (`decode_predictions(task="pose")`): per keypoint,
    ``xy_px = raw_xy * 2 * stride + (anchor_px - stride/2)`` and
    ``vis = sigmoid(raw_v)``.
    """

    n_kpt: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        outs = super().__call__(feats, train)
        full = []
        c4 = max(feats[0].shape[-1] // 4, self.n_kpt * 3)
        for f, (box, cls) in zip(feats, outs):
            kp = ConvBnAct(c4, 3, dtype=self.dtype, folded=self.folded)(f, train)
            kp = ConvBnAct(c4, 3, dtype=self.dtype, folded=self.folded)(kp, train)
            kp = nn.Conv(self.n_kpt * 3, (1, 1), dtype=self.dtype)(kp)
            full.append((box, cls, kp))
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
            mc = ConvBnAct(c4, 3, dtype=self.dtype, folded=self.folded)(f, train)
            mc = nn.Conv(self.n_coeffs, (1, 1), dtype=self.dtype)(mc)
            full.append((box, cls, mc))
        return full


class Proto(nn.Module):
    """Prototype-mask net from the P3 feature: conv -> 2x upsample -> conv ->
    ``n_protos`` mask bases at 1/4 input resolution."""

    n_protos: int = 32
    mid: int = 64
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, p3, train: bool = False):
        x = ConvBnAct(self.mid, 3, dtype=self.dtype, folded=self.folded)(p3, train)
        x = _upsample2(x)
        x = ConvBnAct(self.mid, 3, dtype=self.dtype, folded=self.folded)(x, train)
        return nn.Conv(self.n_protos, (1, 1), dtype=self.dtype)(x)


class YOLO(nn.Module):
    """YOLO detector.  ``variant``: n/s/m scale; ``task``: detect | obb |
    segment; ``family`` selects the architecture generation:

    * ``"v8"`` (default): CSP backbone with C2f blocks + SPPF, PAN-FPN neck —
      the family all shipped checkpoints use.
    * ``"v11"``: C3k2 blocks + SPPF + C2PSA attention tail, C3k2 neck — the
      block structure of the reference's OBB model (yolo11n-obb,
      `runs/obb/train/args.yaml`).
    * ``"v12"``: attention-centric — C3k2 early stages, A2C2f area-attention
      stages (area=4 at stride 16, global at stride 32), A2C2f neck — the
      block structure of the reference's detect model (yolo12n,
      `train2/args.yaml:1`).

    The v11/v12 graphs follow the public model yamls at the block level
    (channel ladders, block counts, depth/width scales); they are capability
    ports, not weight-compatible reimplementations — reference weights are
    PyTorch and are never loaded.
    """

    num_classes: int = 1
    variant: str = "n"
    task: str = "detect"
    family: str = "v8"
    reg_max: int = 16
    n_kpt: int = 4
    compute_dtype: jnp.dtype = jnp.float32
    fold_bn: bool = False  # inference-only: BN affine pre-absorbed into conv kernel/bias

    def setup(self):
        scales = {
            "v8": {"n": (0.33, 0.25), "s": (0.33, 0.5), "m": (0.67, 0.75)},
            "v11": {"n": (0.5, 0.25), "s": (0.5, 0.5), "m": (0.5, 1.0)},
            "v12": {"n": (0.5, 0.25), "s": (0.5, 0.5), "m": (0.5, 1.0)},
        }
        depth, width = scales[self.family][self.variant]
        ch = [_make_divisible(c * width) for c in (64, 128, 256, 512, 1024)]
        ch[4] = min(ch[4], _make_divisible(1024 * width))
        self._ch = ch
        dt = self.compute_dtype
        self.stem = ConvBnAct(ch[0], 3, 2, dtype=dt, folded=self.fold_bn)
        self.down2 = ConvBnAct(ch[1], 3, 2, dtype=dt, folded=self.fold_bn)
        self.down3 = ConvBnAct(ch[2], 3, 2, dtype=dt, folded=self.fold_bn)
        self.pan_d3 = ConvBnAct(ch[2], 3, 2, dtype=dt, folded=self.fold_bn)
        self.pan_d4 = ConvBnAct(ch[3], 3, 2, dtype=dt, folded=self.fold_bn)
        if self.family == "v8":
            n1 = max(round(3 * depth), 1)
            n2 = max(round(6 * depth), 1)
            self.c2f_2 = C2f(ch[1], n1, True, dtype=dt, folded=self.fold_bn)
            self.c2f_3 = C2f(ch[2], n2, True, dtype=dt, folded=self.fold_bn)
            self.down4 = ConvBnAct(ch[3], 3, 2, dtype=dt, folded=self.fold_bn)
            self.c2f_4 = C2f(ch[3], n2, True, dtype=dt, folded=self.fold_bn)
            self.down5 = ConvBnAct(ch[4], 3, 2, dtype=dt, folded=self.fold_bn)
            self.c2f_5 = C2f(ch[4], n1, True, dtype=dt, folded=self.fold_bn)
            self.sppf = SPPF(ch[4], dtype=dt, folded=self.fold_bn)
            self.neck_p4 = C2f(ch[3], n1, False, dtype=dt, folded=self.fold_bn)
            self.neck_p3 = C2f(ch[2], n1, False, dtype=dt, folded=self.fold_bn)
            self.pan_p4 = C2f(ch[3], n1, False, dtype=dt, folded=self.fold_bn)
            self.pan_p5 = C2f(ch[4], n1, False, dtype=dt, folded=self.fold_bn)
        elif self.family == "v11":
            n = max(round(2 * depth), 1)
            self.b2 = C3k2(ch[2], n, False, 0.25, dtype=dt, folded=self.fold_bn)
            self.b3 = C3k2(ch[3], n, False, 0.25, dtype=dt, folded=self.fold_bn)
            self.down4 = ConvBnAct(ch[3], 3, 2, dtype=dt, folded=self.fold_bn)
            self.b4 = C3k2(ch[3], n, True, dtype=dt, folded=self.fold_bn)
            self.down5 = ConvBnAct(ch[4], 3, 2, dtype=dt, folded=self.fold_bn)
            self.b5 = C3k2(ch[4], n, True, dtype=dt, folded=self.fold_bn)
            self.sppf = SPPF(ch[4], dtype=dt, folded=self.fold_bn)
            self.psa = C2PSA(ch[4], n, dtype=dt, folded=self.fold_bn)
            self.neck_p4 = C3k2(ch[3], n, False, dtype=dt, folded=self.fold_bn)
            self.neck_p3 = C3k2(ch[2], n, False, dtype=dt, folded=self.fold_bn)
            self.pan_p4 = C3k2(ch[3], n, False, dtype=dt, folded=self.fold_bn)
            self.pan_p5 = C3k2(ch[4], n, True, dtype=dt, folded=self.fold_bn)
        elif self.family == "v12":
            n = max(round(2 * depth), 1)
            self.b2 = C3k2(ch[2], n, False, 0.25, dtype=dt, folded=self.fold_bn)
            self.b3 = C3k2(ch[3], n, False, 0.25, dtype=dt, folded=self.fold_bn)
            self.down4 = ConvBnAct(ch[3], 3, 2, dtype=dt, folded=self.fold_bn)
            self.b4 = A2C2f(ch[3], 2 * n, True, 4, dtype=dt, folded=self.fold_bn)
            self.down5 = ConvBnAct(ch[4], 3, 2, dtype=dt, folded=self.fold_bn)
            self.b5 = A2C2f(ch[4], 2 * n, True, 1, dtype=dt, folded=self.fold_bn)
            self.neck_p4 = A2C2f(ch[3], n, False, dtype=dt, folded=self.fold_bn)
            self.neck_p3 = A2C2f(ch[2], n, False, dtype=dt, folded=self.fold_bn)
            self.pan_p4 = A2C2f(ch[3], n, False, dtype=dt, folded=self.fold_bn)
            self.pan_p5 = C3k2(ch[4], n, True, dtype=dt, folded=self.fold_bn)
        else:
            raise ValueError(f"unknown family: {self.family}")
        if self.task == "obb":
            self.head = OBBHead(self.num_classes, self.reg_max, dtype=dt, folded=self.fold_bn)
        elif self.task == "segment":
            self.head = SegmentHead(self.num_classes, self.reg_max, dtype=dt, folded=self.fold_bn)
            self.proto = Proto(dtype=dt, folded=self.fold_bn)
        elif self.task == "pose":
            self.head = PoseHead(self.num_classes, self.reg_max, n_kpt=self.n_kpt, dtype=dt, folded=self.fold_bn)
        else:
            self.head = DetectHead(self.num_classes, self.reg_max, dtype=dt, folded=self.fold_bn)

    def _backbone(self, x, train: bool):
        """Returns the (P3, P4, P5) pyramid (strides 8/16/32)."""
        x = self.stem(x, train)
        x = self.down2(x, train)
        if self.family == "v8":
            x = self.c2f_2(x, train)
            x = self.down3(x, train)
            p3 = self.c2f_3(x, train)
            x = self.down4(p3, train)
            p4 = self.c2f_4(x, train)
            x = self.down5(p4, train)
            x = self.c2f_5(x, train)
            p5 = self.sppf(x, train)
        else:
            x = self.b2(x, train)
            x = self.down3(x, train)
            p3 = self.b3(x, train)
            x = self.down4(p3, train)
            p4 = self.b4(x, train)
            x = self.down5(p4, train)
            p5 = self.b5(x, train)
            if self.family == "v11":
                p5 = self.psa(self.sppf(p5, train), train)
        return p3, p4, p5

    def __call__(self, images, train: bool = False):
        """images: ``(B, H, W, 3)`` float in [0, 1]; H, W divisible by 32.

        Returns the per-level raw head outputs (decode with `decode_predictions`).
        """
        x = images.astype(self.compute_dtype)
        p3, p4, p5 = self._backbone(x, train)

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


def decode_keypoints(raw: jnp.ndarray, anchors: jnp.ndarray, strides: jnp.ndarray) -> jnp.ndarray:
    """Raw pose-head output ``(..., A, K*3)`` -> ``(..., A, K, 3)`` decoded
    ``[x_px, y_px, visibility]``: ``xy = raw*2*stride + (anchor - stride/2)``
    (the v8-pose decode), visibility through a sigmoid."""
    k3 = raw.shape[-1]
    kpts = raw.reshape(*raw.shape[:-1], k3 // 3, 3).astype(jnp.float32)
    base = anchors - 0.5 * strides[:, None]  # (A, 2)
    xy = kpts[..., :2] * 2.0 * strides[:, None, None] + base[:, None, :]
    vis = jax.nn.sigmoid(kpts[..., 2:3])
    return jnp.concatenate([xy, vis], axis=-1)


def decode_predictions(outs, img_size: int, reg_max: int = 16, task: str | None = None):
    """Head outputs -> flat per-anchor ``(boxes_xyxy, scores, extras)``.

    boxes in pixels; scores are per-class sigmoid probabilities ``(B, A, C)``.
    ``extras`` by head: OBB -> rotation angle ``(B, A)``; segment -> mask
    coefficients ``(B, A, P)``; pose (``task="pose"``) -> decoded keypoints
    ``(B, A, K, 3)`` ``[x_px, y_px, vis]``; plain detect -> None.  ``task``
    may be omitted for OBB/segment (disambiguated by channel count).
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
            if task == "pose":  # keypoints (B, A, K, 3)
                extras_l.append(decode_keypoints(extra.reshape(b, n, -1), anc, stri))
            elif task == "obb" or (task is None and extra.shape[-1] == 1):
                # OBB rotation angle in (-pi/4, 3pi/4); explicit task wins,
                # channel-count check only as the task-less fallback
                extras_l.append(
                    (jax.nn.sigmoid(extra.reshape(b, n).astype(jnp.float32)) - 0.25) * math.pi
                )
            else:  # segment: mask coefficients (B, A, P)
                extras_l.append(extra.reshape(b, n, -1).astype(jnp.float32))
    boxes = jnp.concatenate(boxes, axis=1)
    scores = jnp.concatenate(scores, axis=1)
    extras = jnp.concatenate(extras_l, axis=1) if extras_l else None
    return boxes, scores, extras


def decode_topk(outs, img_size: int, k: int, reg_max: int = 16, task: str | None = None):
    """Head decode that selects top-K candidates BEFORE the per-anchor decode.

    `decode_predictions` runs the DFL softmax + box assembly (and the task
    head's extra decode: pose keypoints, OBB angle, mask coefficients) over
    all A anchors (A=8400 at 640 px, 21,504 at OBB's 1024 px) and then NMS
    keeps <=K of them; since ``argmax/max`` over class logits commute with
    the (monotone) sigmoid, the top-K-by-confidence set is known from the
    raw logits, so the f32 DFL softmax, the expected-bin reduction, the
    anchor box assembly and the extras decode need only run on the K
    winners.  Removes the largest decode passes at every batch size (the
    latency-regime tail of the detect roofline, docs/PERF.md).

    Returns per-image score-sorted candidates ``(boxes_xyxy (B,K,4),
    scores (B,K), classes (B,K) i32, idx (B,K) i32, extras)`` with ``idx``
    indexing the flat anchor axis in `decode_predictions` order — identical
    candidate set/order as decode_predictions + best_class + top_k.
    ``extras`` rows are ALIGNED with the candidate rows (pose ->
    ``(B,K,nk,3)`` decoded keypoints, OBB -> ``(B,K)`` angles, segment ->
    ``(B,K,P)`` mask coefficients, detect -> None), unlike
    `decode_predictions`' full per-anchor extras.
    """
    anchors, strides = make_anchors(img_size)
    cls_flat, box_flat, extra_flat = [], [], []
    for out in outs:
        box_l, cls_l = out[0], out[1]
        b, h, w, _ = box_l.shape
        cls_flat.append(cls_l.reshape(b, h * w, -1))
        box_flat.append(box_l.reshape(b, h * w, 4 * reg_max))
        if len(out) == 3:
            extra_flat.append(out[2].reshape(b, h * w, -1))
    cls_flat = jnp.concatenate(cls_flat, axis=1)   # (B, A, C) raw logits
    box_flat = jnp.concatenate(box_flat, axis=1)   # (B, A, 4*reg_max)

    # rank in f32 sigmoid space exactly like decode_predictions + best_class
    # + top_k: a bf16-logit ranking can disagree under sigmoid saturation
    # (logit > ~17 -> prob 1.0 ties that f32 probs tie but bf16 logits don't)
    # or exact logit ties, changing which box survives NMS (ADVICE r4)
    probs = jax.nn.sigmoid(cls_flat.astype(jnp.float32))          # (B, A, C)
    conf = jnp.max(probs, axis=-1)                                # (B, A)
    cls_idx = jnp.argmax(probs, axis=-1).astype(jnp.int32)        # (B, A)
    top_conf, top_idx = jax.lax.top_k(conf, k)                    # (B, K)

    box_logits_k = jnp.take_along_axis(box_flat, top_idx[..., None], axis=1)
    ltrb = dfl_decode(box_logits_k, reg_max)                      # (B, K, 4)
    anc = anchors[top_idx]                                        # (B, K, 2)
    stri = strides[top_idx]                                       # (B, K)
    xy1 = anc - ltrb[..., :2] * stri[..., None]
    xy2 = anc + ltrb[..., 2:] * stri[..., None]
    boxes = jnp.concatenate([xy1, xy2], axis=-1)
    scores = top_conf
    classes = jnp.take_along_axis(cls_idx, top_idx, axis=1)

    extras = None
    if extra_flat:
        raw = jnp.take_along_axis(
            jnp.concatenate(extra_flat, axis=1), top_idx[..., None], axis=1
        )  # (B, K, E) raw head output on the winners only
        if task == "pose":
            extras = jax.vmap(decode_keypoints)(raw, anc, stri)   # (B, K, nk, 3)
        elif task == "obb" or (task is None and raw.shape[-1] == 1):
            # OBB: rotation angle in (-pi/4, 3pi/4).  Branch on the task when
            # given — a segment head with P=1 mask coefficient would otherwise
            # be silently decoded as an angle (ADVICE r4); the shape check is
            # only the task-less fallback.
            extras = (jax.nn.sigmoid(raw[..., 0].astype(jnp.float32)) - 0.25) * math.pi
        else:  # segment: mask coefficients (B, K, P)
            extras = raw.astype(jnp.float32)
    return boxes, scores, classes, top_idx.astype(jnp.int32), extras


def fold_batchnorm(params, batch_stats, eps: float = 1e-3):
    """Absorb every ConvBnAct's BatchNorm affine into its conv kernel + bias.

    ``y = BN(K * x) = (K*x - mean)/sqrt(var+eps) * scale + bias`` folds to
    ``K' = K * scale/sqrt(var+eps)`` (broadcast over the output channel) and
    ``b' = bias - mean * scale/sqrt(var+eps)`` — exactly the inference
    function, one op and one HBM round trip fewer per block (the detect
    roofline is HBM-bound at every batch size, scripts/detect_roofline.py).

    Only scopes that ARE a ConvBnAct (exactly {Conv_0, BatchNorm_0}) fold;
    bare Conv+BatchNorm pairs inside PSA/ABlock scopes keep their BN (the
    folded model still applies it).  Returns ``(params, batch_stats)`` shaped
    for ``YOLO(fold_bn=True)``.
    """
    import numpy as _np

    def walk(p, bs):
        if not isinstance(p, dict):
            return p, bs
        if set(p.keys()) == {"Conv_0", "BatchNorm_0"} and "kernel" in p["Conv_0"]:
            k = _np.asarray(p["Conv_0"]["kernel"], _np.float32)
            g = _np.asarray(p["BatchNorm_0"]["scale"], _np.float32)
            b = _np.asarray(p["BatchNorm_0"]["bias"], _np.float32)
            mean = _np.asarray(bs["BatchNorm_0"]["mean"], _np.float32)
            var = _np.asarray(bs["BatchNorm_0"]["var"], _np.float32)
            s = g / _np.sqrt(var + eps)
            return {"Conv_0": {"kernel": jnp.asarray(k * s), "bias": jnp.asarray(b - mean * s)}}, None
        new_p, new_bs = {}, {}
        for key, sub in p.items():
            sub_bs = bs.get(key, {}) if isinstance(bs, dict) else {}
            fp, fbs = walk(sub, sub_bs)
            new_p[key] = fp
            if fbs:
                new_bs[key] = fbs
        # keep batch_stats subtrees with no params sibling (bare BatchNorms)
        if isinstance(bs, dict):
            for key, sub in bs.items():
                if key not in p:
                    new_bs[key] = sub
        return new_p, (new_bs or None)

    fp, fbs = walk(params, batch_stats or {})
    return fp, (fbs or {})
