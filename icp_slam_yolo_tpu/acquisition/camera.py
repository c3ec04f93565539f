"""Stereo camera capture (`labels_segmentation/chup_anh.py:1-42` parity).

The reference opens two ``cv2.VideoCapture`` devices and saves paired jpgs
``anh_1_N`` / ``anh_2_N`` on the 'c' key.  Here: a `StereoCapture` with a
pluggable frame source (real cameras need hardware + OpenCV, gated like the
LiDAR serial backend; `ReplayCamera` serves recorded frames for tests), and
the camera-worker behaviour of `mainn.py:135-266` — event-gated lazy open,
frame pair grab, release on trigger clear — as `TriggeredCameraWorker`.
"""

from __future__ import annotations

import os
import threading
import time

import numpy as np


class CameraBackend:
    def open(self) -> None: ...
    def release(self) -> None: ...
    def read(self) -> np.ndarray | None:
        raise NotImplementedError

    @property
    def is_open(self) -> bool:
        return False


class ReplayCamera(CameraBackend):
    """Serves frames from a directory of images (loops)."""

    def __init__(self, directory: str, pattern_prefix: str = ""):
        names = sorted(
            n for n in os.listdir(directory)
            if n.startswith(pattern_prefix) and n.lower().endswith((".jpg", ".jpeg", ".png"))
        )
        if not names:
            raise FileNotFoundError(f"no frames under {directory}")
        self.paths = [os.path.join(directory, n) for n in names]
        self.idx = 0
        self._open = False

    def open(self) -> None:
        self._open = True

    def release(self) -> None:
        self._open = False

    @property
    def is_open(self) -> bool:
        return self._open

    def read(self) -> np.ndarray | None:
        if not self._open:
            return None
        from PIL import Image

        frame = np.asarray(Image.open(self.paths[self.idx % len(self.paths)]).convert("RGB"))
        self.idx += 1
        return frame


class OpenCVCamera(CameraBackend):
    """Real camera via cv2.VideoCapture (hardware path, retried open like
    `mainn.py:148-156`)."""

    def __init__(self, device: int, retries: int = 3):
        self.device = device
        self.retries = retries
        self._cap = None

    def open(self) -> None:
        import cv2  # type: ignore

        for _ in range(self.retries):
            cap = cv2.VideoCapture(self.device)
            if cap.isOpened():
                self._cap = cap
                return
            time.sleep(0.5)
        raise RuntimeError(f"camera {self.device} failed to open")

    @property
    def is_open(self) -> bool:
        return self._cap is not None

    def read(self) -> np.ndarray | None:
        if self._cap is None:
            return None
        ok, frame = self._cap.read()
        return frame[..., ::-1] if ok else None  # BGR -> RGB

    def release(self) -> None:
        if self._cap is not None:
            self._cap.release()
            self._cap = None


class StereoCapture:
    """Paired capture + save (`chup_anh.py` file naming: anh_1_N / anh_2_N)."""

    def __init__(self, left: CameraBackend, right: CameraBackend, save_dir: str):
        self.left = left
        self.right = right
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self.counter = 0

    def open(self) -> None:
        self.left.open()
        self.right.open()

    def grab_pair(self):
        return self.left.read(), self.right.read()

    def save_pair(self) -> tuple[str, str] | None:
        from PIL import Image

        f1, f2 = self.grab_pair()
        if f1 is None or f2 is None:
            return None
        p1 = os.path.join(self.save_dir, f"anh_1_{self.counter}.jpg")
        p2 = os.path.join(self.save_dir, f"anh_2_{self.counter}.jpg")
        Image.fromarray(f1).save(p1)
        Image.fromarray(f2).save(p2)
        self.counter += 1
        return p1, p2

    def release(self) -> None:
        self.left.release()
        self.right.release()


class TriggeredCameraWorker:
    """The camera-worker loop of `mainn.py:135-266`: wait on a trigger event,
    lazily open both cameras, per tick grab a pair and run the callback
    (detector + stereo math); release the cameras when the trigger clears."""

    def __init__(self, stereo: StereoCapture, trigger: threading.Event,
                 stop: threading.Event, on_pair, poll_s: float = 0.1):
        self.stereo = stereo
        self.trigger = trigger
        self.stop = stop
        self.on_pair = on_pair
        self.poll_s = poll_s
        self.pairs_processed = 0
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def _loop(self) -> None:
        opened = False
        while not self.stop.is_set():
            if not self.trigger.wait(self.poll_s):
                if opened:  # trigger cleared: release (`mainn.py:252-262`)
                    self.stereo.release()
                    opened = False
                continue
            if not opened:
                self.stereo.open()
                opened = True
            f1, f2 = self.stereo.grab_pair()
            if f1 is not None and f2 is not None:
                self.on_pair(f1, f2)
                self.pairs_processed += 1
        if opened:
            self.stereo.release()

    def join(self, timeout: float = 2.0) -> None:
        if self._thread is not None:
            self._thread.join(timeout)
