"""Segmentation training: polygon rasterisation, mask loss, train step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.io.yolo_data import rasterize_polygon
from icp_slam_yolo_tpu.models.losses import segmentation_loss
from icp_slam_yolo_tpu.models.train import create_train_state, make_train_step
from icp_slam_yolo_tpu.models.yolo import YOLO

SIZE = 64


def test_rasterize_polygon():
    poly = np.array([[2.0, 2], [14, 2], [14, 10], [2, 10]])
    mask = rasterize_polygon(poly, 16)
    assert mask.shape == (16, 16)
    assert mask[5, 8] == 1.0 and mask[0, 0] == 0.0
    assert 80 < mask.sum() < 130  # ~12x8 rectangle


def _seg_batch(b=2, m=4):
    rng = np.random.default_rng(0)
    sp = SIZE // 4
    masks = np.zeros((b, m, sp, sp), np.float32)
    masks[:, 0, 2:10, 2:10] = 1.0  # instance mask matching the gt box
    return {
        "images": jnp.asarray(rng.uniform(0, 1, (b, SIZE, SIZE, 3)), jnp.float32),
        "boxes": jnp.asarray(np.tile([[8.0, 8, 40, 40]], (b, m, 1)), jnp.float32),
        "classes": jnp.zeros((b, m), jnp.int32),
        "valid": jnp.asarray(np.tile([True] + [False] * (m - 1), (b, 1))),
        "masks": jnp.asarray(masks),
    }


def test_segmentation_loss_finite():
    model = YOLO(num_classes=1, task="segment")
    batch = _seg_batch()
    variables = model.init(jax.random.key(0), batch["images"])
    outs, protos = model.apply(variables, batch["images"])
    total, metrics = segmentation_loss(
        outs, protos, batch["boxes"], batch["classes"], batch["valid"], batch["masks"], SIZE, 1
    )
    assert np.isfinite(float(total))
    assert "loss_mask" in metrics and float(metrics["loss_mask"]) > 0


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_segment_train_step_decreases():
    model = YOLO(num_classes=1, task="segment")
    state, tx = create_train_state(model, SIZE, total_steps=20)
    step = jax.jit(make_train_step(model, tx, SIZE))
    batch = _seg_batch()
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))
