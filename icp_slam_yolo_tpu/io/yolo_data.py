"""YOLO-format dataset loading (images + normalised label txts).

The reference's datasets (`dataset_pallet/{train,val}`, `obb_hop_chu_nhat/`)
use the Ultralytics layout: ``images/*.jpg`` + ``labels/*.txt`` with rows
``class cx cy w h`` normalised to [0, 1] (detect) or ``class x1 y1 ... x4 y4``
polygons (OBB/segment, cf. `labels_segmentation.py:61-76`).  Batches are
padded to ``max_gt`` boxes with a validity mask for the static-shape loss.
"""

from __future__ import annotations

import os
import random

import numpy as np
from PIL import Image


def find_pairs(root: str, label_root: str | None = None) -> list[tuple[str, str]]:
    """``(image, label)`` path pairs.  Accepts ``root/{images,labels}``
    subdirs, flat dirs with txt next to jpg (the reference uses both), and —
    via ``label_root`` — split image/label dirs (the reference's pose set:
    images in ``camera_data/``, labels in ``output_pose/``)."""
    pairs = []
    if label_root is not None:
        for name in sorted(os.listdir(root)):
            stem, ext = os.path.splitext(name)
            if ext.lower() in (".jpg", ".jpeg", ".png"):
                pairs.append((os.path.join(root, name), os.path.join(label_root, stem + ".txt")))
        return pairs
    img_dir = os.path.join(root, "images")
    lbl_dir = os.path.join(root, "labels")
    if os.path.isdir(img_dir) and os.path.isdir(lbl_dir):
        for name in sorted(os.listdir(img_dir)):
            stem, ext = os.path.splitext(name)
            if ext.lower() in (".jpg", ".jpeg", ".png"):
                lbl = os.path.join(lbl_dir, stem + ".txt")
                pairs.append((os.path.join(img_dir, name), lbl))
    else:
        for name in sorted(os.listdir(root)):
            stem, ext = os.path.splitext(name)
            if ext.lower() in (".jpg", ".jpeg", ".png"):
                pairs.append((os.path.join(root, name), os.path.join(root, stem + ".txt")))
    return pairs


def parse_label_file(path: str):
    """Rows of ``class cx cy w h`` (normalised) -> ``(classes, cxcywh)``;
    polygon rows (>5 cols) are reduced to their bounding box."""
    classes, boxes = [], []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                vals = line.split()
                if len(vals) < 5:
                    continue
                cls = int(float(vals[0]))
                coords = np.array([float(v) for v in vals[1:]])
                if len(coords) == 4:
                    cx, cy, w, h = coords
                else:  # polygon: x1 y1 x2 y2 ...
                    xs, ys = coords[0::2], coords[1::2]
                    cx = (xs.min() + xs.max()) / 2
                    cy = (ys.min() + ys.max()) / 2
                    w = xs.max() - xs.min()
                    h = ys.max() - ys.min()
                classes.append(cls)
                boxes.append([cx, cy, w, h])
    return np.array(classes, np.int32).reshape(-1), np.array(boxes, np.float64).reshape(-1, 4)


def parse_pose_label(path: str):
    """Pose label rows ``class cx cy w h + K x (x y vis)`` (all normalised;
    the reference labeler's pose format, `labels_segmentation.py:107-112`)
    -> ``(classes (M,), cxcywh (M, 4), kpts (M, K, 3))``.

    Corner rows are canonicalised to [tl, tr, br, bl] with the reference's
    own sorting rule (`obb2.py:11-19`: order by y, then each pair by x) —
    735 of the 799 checked-in labels already use that order, but the
    ``anh_2_340+`` range stores the same corners counter-clockwise, which
    would poison keypoint-identity training (the corners carry no intrinsic
    identity: the labeler writes uniform visibility ``[2,2,2,2]``,
    `labels_segmentation.py:34`).  Visibility is binarised (flag 2 -> 1.0)
    and travels with its corner through the reorder.
    """
    classes, boxes, kpts = [], [], []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                vals = line.split()
                if len(vals) < 8 or (len(vals) - 5) % 3 != 0:
                    continue
                classes.append(int(float(vals[0])))
                boxes.append([float(v) for v in vals[1:5]])
                k = np.array([float(v) for v in vals[5:]]).reshape(-1, 3)
                k[:, 2] = (k[:, 2] > 0).astype(np.float64)
                if k.shape[0] == 4:
                    order = np.argsort(k[:, 1], kind="stable")
                    top = order[:2][np.argsort(k[order[:2], 0], kind="stable")]
                    bot = order[2:][np.argsort(k[order[2:], 0], kind="stable")]
                    k = k[[top[0], top[1], bot[1], bot[0]]]  # tl, tr, br, bl
                kpts.append(k)
    n_kpt = kpts[0].shape[0] if kpts else 4
    return (
        np.array(classes, np.int32).reshape(-1),
        np.array(boxes, np.float64).reshape(-1, 4),
        np.array(kpts, np.float64).reshape(-1, n_kpt, 3),
    )


def parse_polygons(path: str):
    """Polygon label rows -> ``(classes, [poly (K, 2) normalised ...])``."""
    classes, polys = [], []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                vals = line.split()
                if len(vals) < 7 or len(vals) % 2 == 0:
                    continue
                classes.append(int(float(vals[0])))
                coords = np.array([float(v) for v in vals[1:]]).reshape(-1, 2)
                polys.append(coords)
    return np.array(classes, np.int32), polys


def polygon_angle(poly: np.ndarray) -> float:
    """Rotation of an OBB polygon from its first edge, wrapped into
    (-pi/4, 3pi/4) — the head's decode range."""
    e = poly[1] - poly[0]
    ang = float(np.arctan2(e[1], e[0]))
    while ang >= 0.75 * np.pi:
        ang -= np.pi
    while ang < -0.25 * np.pi:
        ang += np.pi
    return ang


def rasterize_polygon(poly_px: np.ndarray, size: int) -> np.ndarray:
    """Fill a polygon (pixel coords at the target resolution) into a float mask."""
    from PIL import Image, ImageDraw

    img = Image.new("L", (size, size), 0)
    ImageDraw.Draw(img).polygon([tuple(p) for p in poly_px.tolist()], fill=1)
    return np.asarray(img, np.float32)


LETTERBOX_FILL = 114.0 / 255.0  # Ultralytics pad gray

# pose corner order is [tl, tr, br, bl] (see `parse_pose_label`); a horizontal
# mirror exchanges left<->right corners
KPT_FLIP_PERM = np.array([1, 0, 3, 2])


def letterbox_transform(w0: int, h0: int, size: int):
    """Ultralytics letterbox mapping: uniform scale + centred pad.

    Returns ``(scale, pad_x, pad_y)`` such that an original pixel ``(x, y)``
    lands at ``(x*scale + pad_x, y*scale + pad_y)`` in the ``size x size``
    model input.  Preserves aspect ratio — the stretch resize this replaces
    distorted 640x480 frames by 33% (and OBB angles with them).
    """
    scale = min(size / w0, size / h0)
    nw, nh = round(w0 * scale), round(h0 * scale)
    return scale, (size - nw) / 2.0, (size - nh) / 2.0


def letterbox_image(img: "Image.Image", size: int) -> np.ndarray:
    """PIL image -> ``(size, size, 3) float32 [0,1]`` letterboxed array."""
    w0, h0 = img.size
    scale, px, py = letterbox_transform(w0, h0, size)
    nw, nh = round(w0 * scale), round(h0 * scale)
    resized = np.asarray(img.resize((nw, nh), Image.BILINEAR), np.float32) / 255.0
    out = np.full((size, size, 3), LETTERBOX_FILL, np.float32)
    x0, y0 = int(round(px)), int(round(py))
    out[y0 : y0 + nh, x0 : x0 + nw] = resized[..., :3]
    return out


def map_polygon(poly_norm: np.ndarray, w0: int, h0: int, size: int) -> np.ndarray:
    """Normalised label polygon -> letterboxed model-input pixels."""
    scale, px, py = letterbox_transform(w0, h0, size)
    pts = np.asarray(poly_norm, np.float64) * np.array([w0, h0])
    return (pts * scale + np.array([px, py])).astype(np.float32)


def load_example(img_path: str, lbl_path: str, img_size: int, task: str = "detect",
                 return_kpts: bool = False):
    """Decode + letterbox one example; boxes to xyxy pixels at img_size.

    Returns ``(image, classes, boxes, (scale, pad_x, pad_y, w0, h0))`` — the
    transform unmaps model-space boxes back to original pixels and remaps
    polygon labels (`map_polygon`).  ``task="pose"`` rows carry keypoint
    triplets after the bbox and MUST go through `parse_pose_label`
    (`parse_label_file`'s polygon fallback would misread the
    ``x y vis`` triplets as coordinate pairs and produce garbage boxes).
    """
    img = Image.open(img_path).convert("RGB")
    w0, h0 = img.size
    scale, px, py = letterbox_transform(w0, h0, img_size)
    arr = letterbox_image(img, img_size)
    kp = None
    if task == "pose":
        classes, cxcywh, kp = parse_pose_label(lbl_path)
    else:
        classes, cxcywh = parse_label_file(lbl_path)
    if len(cxcywh):
        cx, cy, bw, bh = (cxcywh[:, 0], cxcywh[:, 1], cxcywh[:, 2], cxcywh[:, 3])
        boxes = np.stack(
            [(cx - bw / 2) * w0 * scale + px, (cy - bh / 2) * h0 * scale + py,
             (cx + bw / 2) * w0 * scale + px, (cy + bh / 2) * h0 * scale + py], axis=1
        ).astype(np.float32)
    else:
        boxes = np.zeros((0, 4), np.float32)
    if return_kpts:
        return arr, classes, boxes, kp, (scale, px, py, w0, h0)
    return arr, classes, boxes, (scale, px, py, w0, h0)


class DeviceYoloDataset:
    """Device-resident dataset: all images/labels live in HBM; batches are
    on-device gathers driven by tiny per-step index transfers.

    Two reasons: (1) zero per-step host->device image traffic (the axon
    client leaks every transferred buffer host-side — a 640px batch-16 run
    leaks ~113 MB/step and OOMs around step 1200); (2) batch assembly runs at
    HBM speed.  hflip augmentation happens on device from per-sample flags.
    Fits easily: the full pallet dataset is ~3.1 GB f32 at 640px vs 16 GB HBM.
    """

    def __init__(self, root: str, img_size: int = 640, batch_size: int = 16, max_gt: int = 32,
                 seed: int = 0, augment: bool = False, task: str = "detect",
                 label_root: str | None = None, pairs: list | None = None, n_kpt: int = 4,
                 scale_aug: tuple = ()):
        """``scale_aug``: discrete zoom-out factors (e.g. ``(0.5, 0.67, 0.83,
        1.0)``) sampled per example — the device-friendly analog of the
        reference recipe's ``scale: 0.5`` jitter (`train2/args.yaml:61`).
        Images are resized by the factor and pasted centred on the letterbox
        gray; labels transform by ``v' = v*f + s*(1-f)/2``.  Discrete factors
        keep every branch static-shaped; per-sample selection is one gather
        over the stacked variants.  Without it, the from-scratch detector
        does NOT generalise across inference scales (640 px: 0.97 confidence
        -> 512 px: 0.07 on the same frame)."""
        import jax
        import jax.numpy as jnp

        pairs = pairs if pairs is not None else find_pairs(root, label_root)
        if not pairs:
            raise FileNotFoundError(f"no images under {root}")
        if task == "pose" and augment and n_kpt != len(KPT_FLIP_PERM):
            raise ValueError(f"hflip augment assumes {len(KPT_FLIP_PERM)} tl/tr/br/bl keypoints, got n_kpt={n_kpt}")
        n, s, m = len(pairs), img_size, max_gt
        sp = s // 4  # proto-mask resolution
        images = np.zeros((n, s, s, 3), np.float32)
        boxes = np.zeros((n, m, 4), np.float32)
        classes = np.zeros((n, m), np.int32)
        valid = np.zeros((n, m), bool)
        angles = np.zeros((n, m), np.float32)
        masks = np.zeros((n, m, sp, sp), np.float32) if task == "segment" else None
        kpts = np.zeros((n, m, n_kpt, 3), np.float32) if task == "pose" else None
        for i, (ip, lp) in enumerate(pairs):
            img, cls, bxs, kp, (scale, px, py, w0, h0) = load_example(ip, lp, s, task, return_kpts=True)
            images[i] = img
            k = min(len(cls), m)
            boxes[i, :k] = bxs[:k]
            classes[i, :k] = cls[:k]
            valid[i, :k] = True
            if task == "obb":
                _, polys = parse_polygons(lp)
                for j, poly in enumerate(polys[:m]):
                    # angle in letterboxed (= original, scale is uniform) space
                    angles[i, j] = polygon_angle(map_polygon(poly, w0, h0, s))
            elif task == "segment":
                _, polys = parse_polygons(lp)
                for j, poly in enumerate(polys[:m]):
                    masks[i, j] = rasterize_polygon(map_polygon(poly, w0, h0, s) * (sp / s), sp)
            elif task == "pose":
                for j, kj in enumerate(kp[:m]):
                    kpts[i, j, :, 0] = kj[:, 0] * w0 * scale + px
                    kpts[i, j, :, 1] = kj[:, 1] * h0 * scale + py
                    kpts[i, j, :, 2] = kj[:, 2]
        self.n = n
        self.img_size = s
        self.batch_size = batch_size
        self.augment = augment
        self.task = task
        self.rng = np.random.default_rng(seed)
        self._d = {
            "images": jax.device_put(images),
            "boxes": jax.device_put(boxes),
            "classes": jax.device_put(classes),
            "valid": jax.device_put(valid),
        }
        if task == "obb":
            self._d["angles"] = jax.device_put(angles)
        if task == "segment":
            self._d["masks"] = jax.device_put(masks)
        if task == "pose":
            self._d["kpts"] = jax.device_put(kpts)

        scale_aug = tuple(scale_aug)
        self.scale_aug = scale_aug

        @jax.jit
        def gather(data, idx, flips, scale_idx):
            imgs = data["images"][idx]
            bxs = data["boxes"][idx]
            if augment:
                flipped = imgs[:, :, ::-1]
                imgs = jnp.where(flips[:, None, None, None], flipped, imgs)
                fx1 = s - bxs[..., 2]
                fx2 = s - bxs[..., 0]
                fb = jnp.stack([fx1, bxs[..., 1], fx2, bxs[..., 3]], axis=-1)
                bxs = jnp.where(flips[:, None, None], fb, bxs)
            out = {
                "images": imgs,
                "boxes": bxs,
                "classes": data["classes"][idx],
                "valid": data["valid"][idx],
            }
            if "angles" in data:
                ang = data["angles"][idx]
                if augment:
                    # horizontal mirror negates the orientation; wrap back
                    # into the head's (-pi/4, 3pi/4) decode range (an OBB's
                    # angle is pi-periodic)
                    fa = -ang
                    fa = jnp.where(fa <= -0.25 * jnp.pi, fa + jnp.pi, fa)
                    ang = jnp.where(flips[:, None], fa, ang)
                out["angles"] = ang
            if "masks" in data:
                mk = data["masks"][idx]
                if augment:
                    mk = jnp.where(flips[:, None, None, None], mk[:, :, :, ::-1], mk)
                out["masks"] = mk
            if "kpts" in data:
                kp = data["kpts"][idx]
                if augment:
                    # mirror x, then swap left/right corners so the ordered
                    # tl/tr/br/bl semantics survive the flip
                    fk = kp.at[..., 0].set(s - kp[..., 0])[:, :, KPT_FLIP_PERM]
                    kp = jnp.where(flips[:, None, None, None], fk, kp)
                out["kpts"] = kp

            if scale_aug:
                # centred zoom-out: one static-shaped branch per factor,
                # per-sample pick by gathering over the stacked variants
                variants = []
                for f in scale_aug:
                    if f == 1.0:
                        variants.append(out["images"])
                        continue
                    nf = int(round(s * f))
                    r = jax.image.resize(
                        out["images"], (out["images"].shape[0], nf, nf, 3), "bilinear"
                    )
                    canvas = jnp.full_like(out["images"], LETTERBOX_FILL)
                    pad0 = (s - nf) // 2
                    variants.append(
                        jax.lax.dynamic_update_slice(canvas, r, (0, pad0, pad0, 0))
                    )
                stacked = jnp.stack(variants)  # (F, B, s, s, 3)
                b_idx = jnp.arange(stacked.shape[1])
                out["images"] = stacked[scale_idx, b_idx]
                fv = jnp.asarray(scale_aug, jnp.float32)[scale_idx]  # (B,)
                off = s * (1.0 - fv) / 2.0
                out["boxes"] = out["boxes"] * fv[:, None, None] + off[:, None, None]
                if "kpts" in out:
                    kp = out["kpts"]
                    xy = kp[..., :2] * fv[:, None, None, None] + off[:, None, None, None]
                    out["kpts"] = jnp.concatenate([xy, kp[..., 2:]], axis=-1)
                if "masks" in out:
                    mk = out["masks"]  # (B, M, sp, sp) at 1/4 model resolution
                    bm, mm, sp_, _ = mk.shape
                    mvars = []
                    for f in scale_aug:
                        if f == 1.0:
                            mvars.append(mk)
                            continue
                        nf = max(int(round(sp_ * f)), 1)
                        rm = jax.image.resize(mk, (bm, mm, nf, nf), "nearest")
                        cv = jnp.zeros_like(mk)
                        p0 = (sp_ - nf) // 2
                        mvars.append(jax.lax.dynamic_update_slice(cv, rm, (0, 0, p0, p0)))
                    out["masks"] = jnp.stack(mvars)[scale_idx, b_idx]
                # angles are scale-invariant (uniform zoom)
            return out

        self._gather = gather

    def __len__(self):
        return self.n

    def __iter__(self):
        import jax.numpy as jnp

        while True:
            idx = self.rng.choice(self.n, self.batch_size, replace=self.n < self.batch_size)
            flips = self.rng.random(self.batch_size) < 0.5 if self.augment else np.zeros(self.batch_size, bool)
            sidx = (self.rng.integers(0, len(self.scale_aug), self.batch_size)
                    if self.scale_aug else np.zeros(self.batch_size, np.int32))
            yield self._gather(self._d, jnp.asarray(idx, jnp.int32), jnp.asarray(flips),
                               jnp.asarray(sidx, jnp.int32))


class YoloDataset:
    """Shuffled batch iterator with fixed-shape padded labels."""

    def __init__(self, root: str, img_size: int = 640, batch_size: int = 16, max_gt: int = 32,
                 seed: int = 0, augment: bool = False, task: str = "detect"):
        self.pairs = find_pairs(root)
        if not self.pairs:
            raise FileNotFoundError(f"no images under {root}")
        self.img_size = img_size
        self.batch_size = batch_size
        self.max_gt = max_gt
        self.rng = random.Random(seed)
        self.augment = augment  # hflip (`train2/args.yaml` fliplr: 0.5)
        self.task = task        # "obb" adds per-gt angles to batches

    def __len__(self):
        return len(self.pairs)

    def __iter__(self):
        order = list(range(len(self.pairs)))
        while True:
            self.rng.shuffle(order)
            for start in range(0, len(order) - self.batch_size + 1, self.batch_size):
                yield self._batch([self.pairs[i] for i in order[start : start + self.batch_size]])

    def _batch(self, pairs):
        b, s, m = self.batch_size, self.img_size, self.max_gt
        images = np.zeros((b, s, s, 3), np.float32)
        boxes = np.zeros((b, m, 4), np.float32)
        classes = np.zeros((b, m), np.int32)
        valid = np.zeros((b, m), bool)
        angles = np.zeros((b, m), np.float32) if self.task == "obb" else None
        kpts = np.zeros((b, m, 4, 3), np.float32) if self.task == "pose" else None
        for i, (ip, lp) in enumerate(pairs):
            img, cls, bxs, kp, (scale, px, py, w0, h0) = load_example(
                ip, lp, s, self.task, return_kpts=True
            )
            if angles is not None:
                _, polys = parse_polygons(lp)
                for j, poly in enumerate(polys[:m]):
                    angles[i, j] = polygon_angle(map_polygon(poly, w0, h0, s))
            if kpts is not None and kp is not None:
                for j, kj in enumerate(kp[:m]):
                    kpts[i, j, :, 0] = kj[:, 0] * w0 * scale + px
                    kpts[i, j, :, 1] = kj[:, 1] * h0 * scale + py
                    kpts[i, j, :, 2] = kj[:, 2]
            if self.augment and self.rng.random() < 0.5:
                img = img[:, ::-1]
                if len(bxs):
                    x1 = s - bxs[:, 2]
                    x2 = s - bxs[:, 0]
                    bxs = np.stack([x1, bxs[:, 1], x2, bxs[:, 3]], axis=1)
                if angles is not None:
                    # mirrored orientation, wrapped to (-pi/4, 3pi/4)
                    fa = -angles[i]
                    angles[i] = np.where(fa <= -0.25 * np.pi, fa + np.pi, fa)
                if kpts is not None:
                    fk = kpts[i].copy()
                    fk[..., 0] = s - fk[..., 0]
                    kpts[i] = fk[:, KPT_FLIP_PERM]
            images[i] = img
            k = min(len(cls), m)
            boxes[i, :k] = bxs[:k]
            classes[i, :k] = cls[:k]
            valid[i, :k] = True
        batch = {"images": images, "boxes": boxes, "classes": classes, "valid": valid}
        if angles is not None:
            batch["angles"] = angles
        if kpts is not None:
            batch["kpts"] = kpts
        return batch
