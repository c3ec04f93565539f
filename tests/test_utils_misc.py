"""Settings parser, path registry, image utilities."""

import numpy as np
from PIL import Image

from icp_slam_yolo_tpu.data.settings import PathRegistry, read_settings, write_settings
from icp_slam_yolo_tpu.utils.images import hsv_edge_boxes, hsv_mask, reset_directory, resize_images


def test_settings_roundtrip(tmp_path):
    p = str(tmp_path / "setting.txt")
    write_settings(p, {"image_dir": "/data/images", "brush_size": "12"})
    s = read_settings(p)
    assert s == {"image_dir": "/data/images", "brush_size": "12"}


def test_settings_skips_comments(tmp_path):
    p = tmp_path / "s.txt"
    p.write_text("# comment\n\nkey1 value with spaces\nkey1 override\n")
    s = read_settings(str(p))
    assert s["key1"] == "override"


def test_path_registry(tmp_path):
    p = str(tmp_path / "paths.txt")
    reg = PathRegistry(p)
    assert reg.get("out", "/default") == "/default"
    reg.set("out", "/data/out")
    assert PathRegistry(p).get("out") == "/data/out"


def test_resize_images(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    Image.new("RGB", (100, 80)).save(src / "a.jpg")
    n = resize_images(str(src), str(tmp_path / "dst"), (32, 32))
    assert n == 1
    assert Image.open(tmp_path / "dst" / "a.jpg").size == (32, 32)


def test_hsv_mask_and_boxes():
    img = np.zeros((40, 40, 3), np.uint8)
    img[10:20, 10:25] = (255, 0, 0)  # pure red block
    mask = hsv_mask(img, (0, 200, 200), (10, 255, 255))
    assert mask[15, 15] and not mask[0, 0]
    boxes = hsv_edge_boxes(img, (0, 200, 200), (10, 255, 255), min_area=20)
    assert boxes == [(10, 10, 25, 20)]


def test_reset_directory(tmp_path):
    d = tmp_path / "x"
    d.mkdir()
    (d / "junk.txt").write_text("x")
    reset_directory(str(d))
    import os

    assert os.path.isdir(d) and not os.listdir(d)


def test_resize_to_width():
    from icp_slam_yolo_tpu.utils.images import resize_to_width

    img = np.zeros((80, 200, 3), np.uint8)
    out, factor = resize_to_width(img, 100)
    assert factor == 2.0 and out.shape[:2] == (40, 100)
    small, factor = resize_to_width(img, 400)  # narrower than target: unchanged
    assert factor == 1.0 and small.shape == img.shape


def test_resize_to_width_exact_and_load(tmp_path):
    from icp_slam_yolo_tpu.utils.images import (
        list_dir_paths, load_resized, resize_to_width_exact,
    )

    img = np.zeros((80, 200, 3), np.uint8)
    out, factor = resize_to_width_exact(img, 400)  # upscales, unlike resize_to_width
    assert factor == 0.5 and out.shape[:2] == (160, 400)

    from PIL import Image

    Image.fromarray(img).save(tmp_path / "a.png")
    loaded = load_resized(str(tmp_path / "a.png"), (50, 20))
    assert loaded.shape == (20, 50, 3)

    paths = list_dir_paths(str(tmp_path))
    assert paths == [str(tmp_path / "a.png")]
    assert list_dir_paths(str(tmp_path / "missing")) == []

def test_resize_frame_channel_swap():
    from icp_slam_yolo_tpu.utils.images import resize_frame

    img = np.zeros((8, 8, 3), np.uint8)
    img[..., 0] = 200  # "blue" plane in BGR order
    out = resize_frame(img, (4, 4), bgr_to_rgb=True)
    assert out.shape == (4, 4, 3)
    assert out[0, 0, 2] == 200 and out[0, 0, 0] == 0  # swapped to RGB


def test_images_to_video_roundtrip(tmp_path):
    from icp_slam_yolo_tpu.utils.images import images_to_video

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(5)]
    # mix in a file path and an odd-sized frame (must be resized to match)
    Image.fromarray(frames[0]).save(tmp_path / "f.png")
    inputs = frames[:3] + [str(tmp_path / "f.png"), rng.integers(0, 255, (10, 10, 3), dtype=np.uint8)]
    dst = str(tmp_path / "clip.avi")
    n = images_to_video(inputs, dst, fps=12)
    assert n == 5

    cv2 = __import__("cv2")  # decode with an independent reader
    cap = cv2.VideoCapture(dst)
    got = 0
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        assert fr.shape == (48, 64, 3)
        got += 1
    assert got == 5
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 12.0) < 1e-6
