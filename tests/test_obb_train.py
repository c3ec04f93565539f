"""OBB training: angle parsing, loss term, end-to-end train step, ICP debug view."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from icp_slam_yolo_tpu.io.yolo_data import polygon_angle
from icp_slam_yolo_tpu.models.losses import detection_loss
from icp_slam_yolo_tpu.models.train import create_train_state, make_train_step
from icp_slam_yolo_tpu.models.yolo import YOLO

SIZE = 64


def test_polygon_angle():
    # axis-aligned box: first edge horizontal -> 0
    poly = np.array([[0, 0], [10, 0], [10, 5], [0, 5]], float)
    assert abs(polygon_angle(poly)) < 1e-9
    # 30-degree box
    c, s = np.cos(0.5), np.sin(0.5)
    rot = poly @ np.array([[c, s], [-s, c]])
    assert abs(polygon_angle(rot) - 0.5) < 1e-6
    # wrap: 170 degrees folds into (-45, 135)
    c, s = np.cos(np.radians(170)), np.sin(np.radians(170))
    rot = poly @ np.array([[c, s], [-s, c]])
    assert -np.pi / 4 <= polygon_angle(rot) < 0.75 * np.pi


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_obb_loss_has_angle_term():
    model = YOLO(num_classes=1, task="obb")
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, SIZE, SIZE, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    outs = model.apply(variables, x)
    gt_boxes = jnp.asarray(np.tile([[8.0, 8, 40, 40]], (2, 4, 1)), jnp.float32)
    gt_classes = jnp.zeros((2, 4), jnp.int32)
    gt_valid = jnp.asarray(np.tile([True, False, False, False], (2, 1)))
    gt_angles = jnp.full((2, 4), 0.3, jnp.float32)
    total, metrics = detection_loss(
        outs, gt_boxes, gt_classes, gt_valid, SIZE, 1, gt_angles=gt_angles
    )
    assert "loss_angle" in metrics
    assert np.isfinite(float(total))
    # without angles the term is absent
    total2, metrics2 = detection_loss(outs, gt_boxes, gt_classes, gt_valid, SIZE, 1)
    assert "loss_angle" not in metrics2
    assert float(total) > float(total2)


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_obb_train_step_decreases():
    model = YOLO(num_classes=1, task="obb")
    state, tx = create_train_state(model, SIZE, total_steps=20)
    step = jax.jit(make_train_step(model, tx, SIZE))
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.uniform(0, 1, (2, SIZE, SIZE, 3)), jnp.float32),
        "boxes": jnp.asarray(np.tile([[8.0, 8, 40, 40]], (2, 4, 1)), jnp.float32),
        "classes": jnp.zeros((2, 4), jnp.int32),
        "valid": jnp.asarray(np.tile([True, False, False, False], (2, 1))),
        "angles": jnp.full((2, 4), 0.3, jnp.float32),
    }
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_render_primitives():
    from icp_slam_yolo_tpu.config import MapConfig
    from icp_slam_yolo_tpu.io.render import draw_points, draw_robot_pose, draw_target, occupancy_rgb

    mc = MapConfig()
    img = occupancy_rgb(np.full((mc.height_px, mc.width_px), 0.5))
    assert img.shape == (mc.height_px, mc.width_px, 3) and img[0, 0, 0] == 127

    draw_points(img, np.array([[0.0, 0.0], [3000.0, 0.0]]), mc)
    cx, cy = mc.center_px
    assert tuple(img[cy, cx]) == (0, 255, 0)
    assert tuple(img[cy, cx + 100]) == (0, 255, 0)

    draw_robot_pose(img, (0.0, 0.0, 0.0), mc)
    assert tuple(img[cy, cx]) == (0, 0, 255)          # robot dot
    assert tuple(img[cy, cx + 8]) == (255, 0, 0)      # heading ray along +x

    draw_target(img, (-3000.0, 0.0), mc)
    assert tuple(img[cy, cx - 100]) == (255, 255, 0)

    # out-of-bounds points must not crash or wrap
    draw_points(img, np.array([[1e6, 1e6]]), mc)


def test_icp_debug_view():
    from icp_slam_yolo_tpu.io.render import icp_debug_view

    mp = np.array([[1000.0, 0], [2000, 500]])
    sp = np.array([[900.0, 0]])
    img = icp_debug_view(mp, sp, (0.0, 0.0, 0.0), size_px=200)
    assert img.shape == (200, 200, 3)
    assert (img == (0, 255, 0)).all(-1).any()    # scan point drawn
    assert (img == (80, 120, 255)).all(-1).any() # map point drawn
