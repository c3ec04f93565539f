"""Segmentation head, proto masks, mask assembly and polygon extraction."""

import numpy as np
import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.models.segment import assemble_masks, mask_to_polygon, masks_to_label_rows
from icp_slam_yolo_tpu.models.yolo import YOLO

SIZE = 128


def test_segment_model_outputs():
    model = YOLO(num_classes=1, task="segment")
    x = jnp.zeros((1, SIZE, SIZE, 3))
    variables = model.init(jax.random.key(0), x)
    outs, protos = model.apply(variables, x)
    assert protos.shape == (1, SIZE // 4, SIZE // 4, 32)
    for (box, cls, mc), stride in zip(outs, (8, 16, 32)):
        n = SIZE // stride
        assert mc.shape == (1, n, n, 32)


def test_assemble_masks_crops_to_box():
    hp = SIZE // 4
    protos = jnp.ones((hp, hp, 4), jnp.float32) * 3.0  # sigmoid(3*sum coeffs)
    coeffs = jnp.asarray([[1.0, 0, 0, 0]])
    boxes = jnp.asarray([[32.0, 32, 64, 64]])  # input px -> mask px /4: 8..16
    masks = np.asarray(assemble_masks(protos, coeffs, boxes, SIZE))
    assert masks.shape == (1, hp, hp)
    assert masks[0, 10, 10] > 0.9     # inside box
    assert masks[0, 20, 20] == 0.0    # outside box: cropped
    assert masks[0, 4, 4] == 0.0


def test_segment_decode_end_to_end():
    """decode_predictions must route the extra branch by channel count:
    (.., 1) = OBB angle, (.., P) = mask coefficients."""
    from icp_slam_yolo_tpu.models.yolo import decode_predictions

    model = YOLO(num_classes=1, task="segment")
    x = jnp.zeros((1, SIZE, SIZE, 3))
    variables = model.init(jax.random.key(0), x)
    outs, protos = model.apply(variables, x)
    boxes, scores, coefs = decode_predictions(outs, SIZE)
    n_anchors = (SIZE // 8) ** 2 + (SIZE // 16) ** 2 + (SIZE // 32) ** 2
    assert coefs.shape == (1, n_anchors, 32)
    masks = assemble_masks(protos[0], coefs[0, :2], boxes[0, :2], SIZE)
    assert masks.shape == (2, SIZE // 4, SIZE // 4)


def test_mask_to_polygon_circle():
    yy, xx = np.mgrid[:64, :64]
    mask = ((yy - 32) ** 2 + (xx - 32) ** 2) < 20**2
    poly = mask_to_polygon(mask.astype(float))
    assert len(poly) >= 8
    r = np.linalg.norm(poly - [32, 32], axis=1)
    np.testing.assert_allclose(r, 20, atol=2.5)  # boundary near the circle


def test_masks_to_label_rows():
    yy, xx = np.mgrid[:64, :64]
    m1 = (((yy - 20) ** 2 + (xx - 20) ** 2) < 100).astype(float)
    rows = masks_to_label_rows(np.stack([m1, np.zeros((64, 64))]), np.array([0, 0]), 64)
    assert len(rows) == 1  # empty mask dropped
    vals = rows[0].split()
    assert vals[0] == "0" and len(vals) % 2 == 1
    coords = np.array([float(v) for v in vals[1:]])
    assert (coords >= 0).all() and (coords <= 1).all()
