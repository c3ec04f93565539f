"""YOLO model: shapes, decode, NMS, detector API (small image sizes on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.models.detect import Detector
from icp_slam_yolo_tpu.models.yolo import YOLO, decode_predictions, dfl_decode, make_anchors
from icp_slam_yolo_tpu.ops.nms import Detections, best_class, box_iou, nms

SIZE = 128  # small for CPU tests; must be divisible by 32


def test_model_output_shapes():
    model = YOLO(num_classes=3)
    x = jnp.zeros((2, SIZE, SIZE, 3))
    variables = model.init(jax.random.key(0), x)
    outs = model.apply(variables, x)
    assert len(outs) == 3
    for (box, cls), stride in zip(outs, (8, 16, 32)):
        n = SIZE // stride
        assert box.shape == (2, n, n, 64)
        assert cls.shape == (2, n, n, 3)


def test_obb_head_has_angle():
    model = YOLO(num_classes=1, task="obb")
    x = jnp.zeros((1, SIZE, SIZE, 3))
    variables = model.init(jax.random.key(0), x)
    outs = model.apply(variables, x)
    assert all(len(o) == 3 for o in outs)
    boxes, scores, angles = decode_predictions(outs, SIZE)
    assert angles is not None
    a = np.asarray(angles)
    assert (a > -np.pi / 4 - 1e-3).all() and (a < 3 * np.pi / 4 + 1e-3).all()


def test_anchors():
    anchors, strides = make_anchors(SIZE)
    n = (SIZE // 8) ** 2 + (SIZE // 16) ** 2 + (SIZE // 32) ** 2
    assert anchors.shape == (n, 2)
    np.testing.assert_allclose(np.asarray(anchors[0]), [4.0, 4.0])  # first P3 centre


def test_dfl_decode_expectation():
    logits = np.full((1, 4 * 16), -20.0, np.float32)
    for side in range(4):
        logits[0, side * 16 + 5] = 20.0  # delta at bin 5
    out = dfl_decode(jnp.asarray(logits.reshape(1, 64)))
    np.testing.assert_allclose(np.asarray(out), np.full((1, 4), 5.0), atol=1e-3)


def test_box_iou():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(box_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray(
        [[0.0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 10, 10]]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.3])
    classes = jnp.asarray([0, 0, 0, 1], jnp.int32)
    det = nms(boxes, scores, classes, conf_threshold=0.25, iou_threshold=0.5, max_detections=4)
    kept = np.asarray(det.valid)
    # box1 suppressed by box0 (same class, IoU>0.5); box3 survives (other class)
    assert kept.sum() == 3
    got = {tuple(np.asarray(det.boxes)[i].astype(int)) for i in range(4) if kept[i]}
    assert (0, 0, 10, 10) in got and (50, 50, 60, 60) in got


def test_nms_conf_threshold():
    boxes = jnp.asarray([[0.0, 0, 10, 10]])
    det = nms(boxes, jnp.asarray([0.2]), jnp.asarray([0], jnp.int32), conf_threshold=0.5, max_detections=4)
    assert not np.asarray(det.valid).any()


def test_detector_end_to_end():
    det = Detector(num_classes=1, img_size=SIZE, conf_threshold=0.5)
    frame = (np.random.default_rng(0).uniform(0, 255, (480, 640, 3))).astype(np.uint8)
    out = det(frame)
    assert out["boxes"].shape[1] == 4 if len(out["boxes"]) else True
    assert set(out) >= {"boxes", "scores", "classes"}
    # untrained model with prior bias ~ -4.6 -> p ~ 0.01: no detections at conf 0.5
    assert len(out["boxes"]) == 0
