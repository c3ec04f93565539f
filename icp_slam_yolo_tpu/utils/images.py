"""Image helpers (`lib_main/convert.py`, `lib_main/bat_canh_img.py`,
`lib_main/remove.py` parity): batch resize, HSV-range contour detection,
directory reset."""

from __future__ import annotations

import os
import shutil

import numpy as np
from PIL import Image


def resize_images(src_dir: str, dst_dir: str, size: tuple[int, int]) -> int:
    """Resize every image in ``src_dir`` into ``dst_dir`` (convert.py parity)."""
    os.makedirs(dst_dir, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(src_dir)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        Image.open(os.path.join(src_dir, name)).convert("RGB").resize(size).save(
            os.path.join(dst_dir, name)
        )
        n += 1
    return n


def resize_to_width(img: np.ndarray, max_width: int) -> tuple[np.ndarray, float]:
    """Shrink an image so its width is at most ``max_width``, returning the
    resized array and the downscale factor (`lib_main/convert.py:19-31`
    ``resize_img`` parity: images narrower than the target pass through with
    factor 1).  The factor lets callers map display-space clicks back to
    original pixels, which is how the labelers use it.
    """
    arr = np.asarray(img)
    h0, w0 = arr.shape[:2]
    if w0 <= max_width:
        return arr.copy(), 1.0
    factor = w0 / max_width
    im = Image.fromarray(arr if arr.dtype == np.uint8 else arr.astype(np.uint8))
    out = im.resize((int(w0 / factor), int(h0 / factor)))
    return np.asarray(out), factor


def resize_to_width_exact(img: np.ndarray, width: int) -> tuple[np.ndarray, float]:
    """Scale an image so its width is exactly ``width`` (up- or downscaling),
    returning the array and the scale factor (`lib_main/convert.py:33-41`
    ``resize_img_shape`` parity — the unconditional variant of
    :func:`resize_to_width`)."""
    arr = np.asarray(img)
    h0, w0 = arr.shape[:2]
    factor = w0 / width
    im = Image.fromarray(arr if arr.dtype == np.uint8 else arr.astype(np.uint8))
    # int(w0 / factor) can truncate one pixel low when the float ratio rounds
    # up — the output width must be exactly the requested one
    out = im.resize((width, max(1, round(h0 / factor))))
    return np.asarray(out), factor


def load_resized(path: str, size: tuple[int, int]) -> np.ndarray:
    """Load an image file as RGB resized to ``(w, h)``
    (`lib_main/convert.py:12-17` ``img_resize_path`` parity — the reference
    wraps the result in a Tk ``PhotoImage``; our UI is a browser, so the RGB
    array is the display-ready form)."""
    return np.asarray(Image.open(path).convert("RGB").resize(size))


def resize_frame(img: np.ndarray, size: tuple[int, int], bgr_to_rgb: bool = False) -> np.ndarray:
    """Resize one video frame to exactly ``(w, h)``, optionally swapping the
    channel order (`lib_main/convert.py:7-11` ``img_resize_vid`` parity — the
    reference resizes a BGR capture frame, converts to RGB and wraps it for
    Tk; our display path consumes the RGB array directly)."""
    arr = np.asarray(img)
    if bgr_to_rgb and arr.ndim == 3:
        arr = arr[..., ::-1]
    im = Image.fromarray(arr if arr.dtype == np.uint8 else arr.astype(np.uint8))
    return np.asarray(im.resize((int(size[0]), int(size[1]))))


def images_to_video(
    frames, dst_path: str, fps: float = 10.0, size: tuple[int, int] | None = None,
    quality: int = 90,
) -> int:
    """Write a sequence of images to an MJPEG ``.avi`` file; returns the frame
    count.

    ``frames`` is an iterable of RGB uint8 arrays and/or image file paths (a
    directory path is also accepted and expands via :func:`list_dir_paths`).
    Frames are resized to ``size`` (defaults to the first frame's size; AVI
    requires uniform dimensions).  The muxer is pure stdlib — each frame is
    JPEG-encoded with PIL and wrapped in a standard RIFF/AVI container
    (``avih``/``strh``/``strf`` headers, ``00dc`` movi chunks, ``idx1``
    keyframe index) so the output plays in browsers/VLC/OpenCV.  Closes the
    images→video gap flagged against `lib_main/convert.py` — the reference
    itself never writes video (no ``VideoWriter`` anywhere in its tree), so
    this is a superset utility for turning capture/replay dumps into clips.
    """
    import io
    import struct

    if isinstance(frames, str):
        frames = list_dir_paths(frames)
    blobs: list[bytes] = []
    w = h = 0
    for f in frames:
        im = Image.open(f).convert("RGB") if isinstance(f, str) else Image.fromarray(
            np.asarray(f, np.uint8)
        ).convert("RGB")
        if size is None:
            size = im.size
        if im.size != tuple(size):
            im = im.resize((int(size[0]), int(size[1])))
        w, h = im.size
        buf = io.BytesIO()
        im.save(buf, format="JPEG", quality=quality)
        blobs.append(buf.getvalue())
    if not blobs:
        raise ValueError("images_to_video: no frames")

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return tag + struct.pack("<I", len(payload)) + payload + (b"\0" if len(payload) & 1 else b"")

    usec = int(round(1_000_000 / float(fps)))
    maxb = max(len(b) for b in blobs)
    avih = struct.pack("<14I", usec, maxb * int(fps), 0, 0x10, len(blobs), 0, 1, maxb, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1, int(round(fps)),
                                           0, len(blobs), maxb, 0xFFFFFFFF, 0, 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + len(chunk(b"strh", strh)) + len(chunk(b"strf", strf))) \
        + b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl_body = b"hdrl" + chunk(b"avih", avih) + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body

    movi_chunks, idx, off = [], [], 4  # offsets count from the 'movi' tag
    for b in blobs:
        c = chunk(b"00dc", b)
        movi_chunks.append(c)
        idx.append(b"00dc" + struct.pack("<III", 0x10, off, len(b)))  # AVIIF_KEYFRAME
        off += len(c)
    movi_body = b"movi" + b"".join(movi_chunks)
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    idx1 = chunk(b"idx1", b"".join(idx))

    riff_body = b"AVI " + hdrl + movi + idx1
    with open(dst_path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body)
    return len(blobs)


def list_dir_paths(folder: str) -> list[str]:
    """Full paths of a directory's entries, [] when the directory is missing
    (`lib_main/convert.py:49-61` ``list_atwork`` parity, minus the Tk error
    popup — callers check for an empty result instead)."""
    if not os.path.isdir(folder):
        return []
    return [os.path.join(folder, name) for name in sorted(os.listdir(folder))]


def rgb_to_hsv(img: np.ndarray) -> np.ndarray:
    """Vectorised RGB [0,255] -> HSV with OpenCV ranges (H 0-179, S/V 0-255)."""
    arr = np.asarray(img, np.float32) / 255.0
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    mx = arr.max(-1)
    mn = arr.min(-1)
    diff = mx - mn + 1e-12
    h = np.zeros_like(mx)
    h = np.where(mx == r, (60 * ((g - b) / diff) + 360) % 360, h)
    h = np.where(mx == g, 60 * ((b - r) / diff) + 120, h)
    h = np.where(mx == b, 60 * ((r - g) / diff) + 240, h)
    s = np.where(mx > 0, diff / (mx + 1e-12), 0)
    return np.stack([h / 2.0, s * 255.0, mx * 255.0], axis=-1)


def hsv_mask(img: np.ndarray, lower, upper) -> np.ndarray:
    """Boolean mask of pixels inside an HSV range (`bat_canh_img.py:8` capability)."""
    hsv = rgb_to_hsv(img)
    lo = np.asarray(lower, np.float32)
    hi = np.asarray(upper, np.float32)
    return ((hsv >= lo) & (hsv <= hi)).all(-1)


def hsv_edge_boxes(img: np.ndarray, lower, upper, min_area: int = 50):
    """Connected-region bounding boxes of an HSV mask (contour-box parity)."""
    mask = hsv_mask(img, lower, upper)
    # simple 4-connected labeling via flood fill (no OpenCV dependency)
    labels = np.zeros(mask.shape, np.int32)
    boxes = []
    next_label = 0
    idx = np.argwhere(mask & (labels == 0))
    import collections

    for y0, x0 in idx:
        if labels[y0, x0] or not mask[y0, x0]:
            continue
        next_label += 1
        q = collections.deque([(y0, x0)])
        labels[y0, x0] = next_label
        ys, xs = [y0], [x0]
        while q:
            y, x = q.popleft()
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ny, nx = y + dy, x + dx
                if 0 <= ny < mask.shape[0] and 0 <= nx < mask.shape[1] and mask[ny, nx] and not labels[ny, nx]:
                    labels[ny, nx] = next_label
                    ys.append(ny)
                    xs.append(nx)
                    q.append((ny, nx))
        if len(ys) >= min_area:
            boxes.append((min(xs), min(ys), max(xs) + 1, max(ys) + 1))
    return boxes


def reset_directory(path: str) -> None:
    """Remove-and-recreate a directory (`lib_main/remove.py` parity)."""
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
