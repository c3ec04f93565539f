"""Pose task: label parsing, keypoint decode, OKS loss, train step.

The ground-truth format is the reference labeler's pose output
(`labels_segmentation.py:107-112`: ``class cx cy w h + 4x(x y vis)``,
normalised), shipped for all 799 `camera_data/` frames in `output_pose/`.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icp_slam_yolo_tpu.io.yolo_data import KPT_FLIP_PERM, parse_pose_label
from icp_slam_yolo_tpu.models.losses import pose_loss
from icp_slam_yolo_tpu.models.train import create_train_state, make_train_step
from icp_slam_yolo_tpu.models.yolo import YOLO, decode_keypoints, decode_predictions, make_anchors

SIZE = 64


def test_parse_pose_label(tmp_path):
    p = tmp_path / "x.txt"
    p.write_text("0 0.5 0.4 0.2 0.1 0.41 0.36 2 0.59 0.36 2 0.59 0.44 2 0.41 0.44 0\n")
    cls, boxes, kpts = parse_pose_label(str(p))
    assert cls.shape == (1,) and boxes.shape == (1, 4) and kpts.shape == (1, 4, 3)
    np.testing.assert_allclose(boxes[0], [0.5, 0.4, 0.2, 0.1])
    np.testing.assert_allclose(kpts[0, 0], [0.41, 0.36, 1.0])  # vis flag 2 -> 1.0
    assert kpts[0, 3, 2] == 0.0  # vis flag 0 stays invisible


def test_parse_pose_label_canonicalizes_ccw(tmp_path):
    """64 of the reference's 799 labels (the anh_2_340+ range) store the same
    corners counter-clockwise; parsing must reorder them to tl/tr/br/bl."""
    p = tmp_path / "ccw.txt"
    # tl, bl, br, tr (counter-clockwise) with a marker visibility on tl
    p.write_text("0 0.5 0.4 0.2 0.1 0.41 0.36 2 0.41 0.44 2 0.59 0.44 2 0.59 0.36 0\n")
    _, _, kpts = parse_pose_label(str(p))
    np.testing.assert_allclose(kpts[0, :, :2],
                               [[0.41, 0.36], [0.59, 0.36], [0.59, 0.44], [0.41, 0.44]])
    assert kpts[0, 1, 2] == 0.0  # the tr visibility flag travelled with its corner


def test_parse_pose_label_reference_artifact():
    path = "/root/reference/output_pose/anh_1_0.txt"
    if not os.path.exists(path):
        pytest.skip("reference pose labels unavailable")
    cls, boxes, kpts = parse_pose_label(path)
    assert kpts.shape == (1, 4, 3)
    assert np.all(kpts[..., 2] == 1.0)
    # checked-in corner order is tl, tr, br, bl
    x, y = kpts[0, :, 0], kpts[0, :, 1]
    assert x[0] < x[1] and x[3] < x[2] and y[0] < y[3] and y[1] < y[2]


def test_decode_keypoints_formula():
    anchors, strides = make_anchors(SIZE)
    a = anchors.shape[0]
    raw = np.zeros((1, a, 12), np.float32)
    out = decode_keypoints(jnp.asarray(raw), anchors, strides)
    assert out.shape == (1, a, 4, 3)
    # zero offsets decode to anchor - stride/2 (the cell corner), vis to 0.5
    np.testing.assert_allclose(
        np.asarray(out[0, :, 0, :2]), np.asarray(anchors - 0.5 * strides[:, None]), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out[..., 2]), 0.5, atol=1e-6)
    # unit offset moves 2*stride in x
    raw[:, :, 0] = 1.0
    out2 = decode_keypoints(jnp.asarray(raw), anchors, strides)
    np.testing.assert_allclose(
        np.asarray(out2[0, :, 0, 0] - out[0, :, 0, 0]), np.asarray(2.0 * strides), atol=1e-4
    )


def test_kpt_flip_perm_is_involution():
    assert np.array_equal(KPT_FLIP_PERM[KPT_FLIP_PERM], np.arange(4))


def _pose_batch(b=2, m=4):
    kpts = np.zeros((b, m, 4, 3), np.float32)
    # corners of the gt box [8, 8, 40, 40] in tl/tr/br/bl order, all visible
    kpts[:, 0] = [[8, 8, 1], [40, 8, 1], [40, 40, 1], [8, 40, 1]]
    return {
        "images": jnp.asarray(np.random.default_rng(0).uniform(0, 1, (b, SIZE, SIZE, 3)), jnp.float32),
        "boxes": jnp.asarray(np.tile([[8.0, 8, 40, 40]], (b, m, 1)), jnp.float32),
        "classes": jnp.zeros((b, m), jnp.int32),
        "valid": jnp.asarray(np.tile([True] + [False] * (m - 1), (b, 1))),
        "kpts": jnp.asarray(kpts),
    }


def test_pose_loss_finite_and_orders():
    model = YOLO(num_classes=1, task="pose")
    batch = _pose_batch()
    variables = model.init(jax.random.key(0), batch["images"])
    outs = model.apply(variables, batch["images"])
    assert outs[0][2].shape[-1] == 12  # 4 keypoints x (dx, dy, vis)
    total, metrics = pose_loss(
        outs, batch["boxes"], batch["classes"], batch["valid"], batch["kpts"], SIZE, 1
    )
    assert np.isfinite(float(total))
    assert float(metrics["loss_kpt"]) > 0 and float(metrics["loss_kobj"]) > 0


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_pose_train_step_decreases():
    model = YOLO(num_classes=1, task="pose")
    state, tx = create_train_state(model, SIZE, total_steps=20)
    step = jax.jit(make_train_step(model, tx, SIZE))
    batch = _pose_batch()
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_pose_decode_predictions_shape():
    model = YOLO(num_classes=1, task="pose")
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    outs = model.apply(variables, x)
    boxes, scores, kpts = decode_predictions(outs, SIZE, task="pose")
    a = boxes.shape[1]
    assert kpts.shape == (1, a, 4, 3)
    assert np.all(np.asarray(kpts[..., 2]) >= 0) and np.all(np.asarray(kpts[..., 2]) <= 1)
