"""YOLO training: loss sanity, TAL assignment, overfit smoke, sharded step,
and the reference dataset loader."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icp_slam_yolo_tpu.models.losses import ciou, detection_loss, task_aligned_assign
from icp_slam_yolo_tpu.models.train import create_train_state, dryrun_train_step, make_train_step
from icp_slam_yolo_tpu.models.yolo import YOLO, make_anchors

SIZE = 64


def _batch(b=2, m=4):
    rng = np.random.default_rng(0)
    return {
        "images": jnp.asarray(rng.uniform(0, 1, (b, SIZE, SIZE, 3)), jnp.float32),
        "boxes": jnp.asarray(np.tile([[8.0, 8, 40, 40]], (b, m, 1)), jnp.float32),
        "classes": jnp.zeros((b, m), jnp.int32),
        "valid": jnp.asarray(np.tile([True] + [False] * (m - 1), (b, 1))),
    }


def test_ciou_perfect_and_disjoint():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    assert abs(float(ciou(a, a)[0]) - 1.0) < 1e-6
    b = jnp.asarray([[100.0, 100, 110, 110]])
    assert float(ciou(a, b)[0]) < 0.0


def test_tal_assigns_inside_anchor():
    anchors, _ = make_anchors(SIZE)
    a = anchors.shape[0]
    scores = jnp.full((a, 1), 0.5)
    # prediction exactly on the gt at some anchors
    gt = jnp.asarray([[8.0, 8, 40, 40]])
    pred = jnp.tile(gt, (a, 1))
    assigned, fg, tgt = task_aligned_assign(
        scores, pred, anchors, gt, jnp.zeros(1, jnp.int32), jnp.ones(1, bool)
    )
    fg = np.asarray(fg)
    anc = np.asarray(anchors)
    inside = (anc[:, 0] > 8) & (anc[:, 0] < 40) & (anc[:, 1] > 8) & (anc[:, 1] < 40)
    assert fg.sum() > 0
    assert (inside | ~fg).all()  # every fg anchor is inside the gt
    assert float(np.asarray(tgt).max()) > 0.5


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_loss_finite_and_decreases():
    model = YOLO(num_classes=1)
    state, tx = create_train_state(model, SIZE, total_steps=30)
    step = jax.jit(make_train_step(model, tx, SIZE))
    batch = _batch()
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses  # overfits a fixed batch
    assert int(metrics["num_fg"]) > 0


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_dryrun_train_step_8dev():
    dryrun_train_step(8, img_size=SIZE)


@pytest.mark.skipif(
    not os.path.isdir("/root/reference/dataset_pallet/train/images"), reason="dataset unavailable"
)
def test_reference_dataset_loads():
    from icp_slam_yolo_tpu.io.yolo_data import YoloDataset

    ds = YoloDataset("/root/reference/dataset_pallet/train", img_size=SIZE, batch_size=2)
    assert len(ds) > 500
    batch = next(iter(ds))
    assert batch["images"].shape == (2, SIZE, SIZE, 3)
    assert batch["valid"].any()
    v = batch["valid"]
    assert (batch["boxes"][v][:, 2] > batch["boxes"][v][:, 0]).all()


def test_write_results_csv(tmp_path):
    from icp_slam_yolo_tpu.models.train import write_results_csv

    hist = [{"step": 1, "loss": 5.0}, {"step": 50, "loss": 2.5, "loss_box": 0.1}]
    p = str(tmp_path / "results.csv")
    write_results_csv(hist, p)
    lines = open(p).read().strip().splitlines()
    assert lines[0].startswith("step,")
    assert lines[1].startswith("1,") and len(lines) == 3
