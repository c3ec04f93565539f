"""YOLO model: shapes, decode, NMS, detector API (small image sizes on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


def test_detect_pair_matches_two_single_calls():
    """`detect_pair` (one batch-2 dispatch, the serving stereo path) must
    return exactly what two single-frame calls return, per eye."""
    det = Detector(num_classes=1, img_size=SIZE, conf_threshold=0.001)
    rng = np.random.default_rng(1)
    f1 = rng.uniform(0, 255, (480, 640, 3)).astype(np.uint8)
    f2 = rng.uniform(0, 255, (480, 640, 3)).astype(np.uint8)
    o1, o2 = det.detect_pair(f1, f2)
    s1, s2 = det(f1), det(f2)
    for got, want in ((o1, s1), (o2, s2)):
        assert len(got["boxes"]) == len(want["boxes"])
        np.testing.assert_allclose(got["boxes"], want["boxes"], atol=1e-4)
        np.testing.assert_allclose(got["scores"], want["scores"], atol=1e-5)
        np.testing.assert_array_equal(got["classes"], want["classes"])


def test_nms_anchor_idx_tracks_kept_boxes():
    """anchor_idx points back into the flat candidate axis for every kept box."""
    boxes = jnp.asarray(
        [[0.0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 10, 10]]
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.3])
    classes = jnp.asarray([0, 0, 0, 1], jnp.int32)
    det = nms(boxes, scores, classes, conf_threshold=0.25, iou_threshold=0.5, max_detections=4)
    kept = np.asarray(det.valid)
    idx = np.asarray(det.anchor_idx)
    for i in range(4):
        if kept[i]:
            np.testing.assert_allclose(np.asarray(det.boxes)[i], np.asarray(boxes)[idx[i]])
            assert float(scores[idx[i]]) == float(np.asarray(det.scores)[i])
        else:
            assert idx[i] == -1


def test_detector_obb_angles_align_with_boxes():
    """out['angles'] rows must correspond 1:1 to out['boxes'] rows (the old
    code returned ALL per-anchor angles)."""
    det = Detector(num_classes=1, task="obb", img_size=SIZE, conf_threshold=0.005)
    frame = (np.random.default_rng(1).uniform(0, 255, (480, 640, 3))).astype(np.uint8)
    out = det(frame)
    assert len(out["angles"]) == len(out["boxes"])
    if len(out["angles"]):
        a = out["angles"]
        assert (a > -np.pi / 4 - 1e-3).all() and (a < 3 * np.pi / 4 + 1e-3).all()


def test_detector_segment_coeffs_align_with_boxes():
    det = Detector(num_classes=1, task="segment", img_size=SIZE, conf_threshold=0.005)
    frame = (np.random.default_rng(2).uniform(0, 255, (480, 640, 3))).astype(np.uint8)
    out = det(frame)
    assert "angles" not in out
    assert len(out["mask_coeffs"]) == len(out["boxes"])
    assert len(out["masks"]) == len(out["boxes"])
    if len(out["masks"]):
        assert out["masks"].shape[1:] == (SIZE // 4, SIZE // 4)


def test_letterbox_preserves_aspect_and_unmaps_exactly():
    """640x480 -> 128: uniform scale, centred pad, exact round-trip unmap."""
    from icp_slam_yolo_tpu.io.yolo_data import LETTERBOX_FILL, letterbox_transform

    det = Detector(num_classes=1, img_size=SIZE, conf_threshold=0.5)
    frame = np.zeros((480, 640, 3), np.uint8)
    frame[100:140, 300:400] = 200
    batch, (scale, px, py) = det.preprocess(frame)
    assert batch.shape == (1, SIZE, SIZE, 3)
    s2, px2, py2 = letterbox_transform(640, 480, SIZE)
    assert (scale, px, py) == (s2, px2, py2)
    assert scale == SIZE / 640 and px == 0 and py == (SIZE - round(480 * scale)) / 2
    # pad rows above/below hold the Ultralytics gray
    np.testing.assert_allclose(batch[0, 0], LETTERBOX_FILL)
    np.testing.assert_allclose(batch[0, -1], LETTERBOX_FILL)
    # the bright block lands at the mapped location (uniform in x and y)
    ys, xs = np.nonzero(batch[0, :, :, 0] > 0.5)
    np.testing.assert_allclose(xs.min(), 300 * scale + px, atol=1.5)
    np.testing.assert_allclose(ys.min(), 100 * scale + py, atol=1.5)
    # unmap round trip
    assert abs((xs.min() - px) / scale - 300) < 1.5 / scale


def test_load_example_letterboxes_boxes():
    import tempfile, os
    from PIL import Image
    from icp_slam_yolo_tpu.io.yolo_data import letterbox_transform, load_example

    d = tempfile.mkdtemp()
    Image.new("RGB", (640, 480), (10, 10, 10)).save(os.path.join(d, "a.jpg"))
    with open(os.path.join(d, "a.txt"), "w") as f:
        f.write("0 0.5 0.5 0.25 0.5\n")  # centred box 160x240 px
    img, cls, boxes, (scale, px, py, w0, h0) = load_example(
        os.path.join(d, "a.jpg"), os.path.join(d, "a.txt"), SIZE
    )
    assert (w0, h0) == (640, 480)
    assert (scale, px, py) == letterbox_transform(640, 480, SIZE)
    x1, y1, x2, y2 = boxes[0]
    # aspect preserved: width/height ratio of the box matches the original
    np.testing.assert_allclose((x2 - x1) / (y2 - y1), 160 / 240, rtol=1e-5)
    np.testing.assert_allclose([x1, y1], [240 * scale + px, 120 * scale + py], rtol=1e-5)


@pytest.mark.slow  # integration/parity: quality gate + train scripts cover it
def test_family_variants_forward_and_decode():
    """v11 (C3k2 + C2PSA) and v12 (area-attention A2C2f) families: init,
    forward, decode — same head contract as v8; param counts in the
    yolo11n/yolo12n class (~2.5-3M at width 0.25)."""
    import numpy as np

    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    for fam, lo, hi in (("v11", 2.0e6, 3.5e6), ("v12", 2.0e6, 3.5e6)):
        model = YOLO(num_classes=1, family=fam)
        vs = model.init(jax.random.PRNGKey(0), x, train=False)
        outs = model.apply(vs, x, train=False)
        boxes, scores, extras = decode_predictions(outs, 128)
        assert boxes.shape == (1, 336, 4) and scores.shape == (1, 336, 1)
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(vs["params"]))
        assert lo < n < hi, (fam, n)


def test_family_obb_head():
    model = YOLO(num_classes=1, task="obb", family="v11")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vs = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(vs, x, train=False)
    boxes, scores, angles = decode_predictions(outs, 64)
    assert angles.shape == (1, 84)


def test_device_dataset_scale_aug(tmp_path):
    """Discrete zoom-out augmentation: image content and labels transform
    consistently (v' = v*f + s*(1-f)/2), f=1.0 is the identity."""
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from icp_slam_yolo_tpu.io.yolo_data import DeviceYoloDataset

    s = 64
    d = tmp_path / "ds"
    d.mkdir()
    arr = np.zeros((s, s, 3), np.uint8)
    arr[16:32, 16:32] = 255  # white square, bbox (16,16)-(32,32)
    PILImage.fromarray(arr).save(d / "a.jpg")
    (d / "a.txt").write_text("0 0.375 0.375 0.25 0.25\n")

    ds = DeviceYoloDataset(str(d), img_size=s, batch_size=2, max_gt=2,
                           scale_aug=(0.5, 1.0))
    idx = jnp.zeros(2, jnp.int32)
    flips = jnp.zeros(2, bool)
    batch = ds._gather(ds._d, idx, flips, jnp.asarray([0, 1], jnp.int32))

    # sample 1 (f=1.0): identity
    np.testing.assert_allclose(np.asarray(batch["boxes"][1, 0]), [16, 16, 32, 32], atol=1.5)
    # sample 0 (f=0.5): box at v*0.5 + 16
    np.testing.assert_allclose(np.asarray(batch["boxes"][0, 0]), [24, 24, 32, 32], atol=1.5)
    # image content moved with the box: bright pixels inside the scaled bbox
    img0 = np.asarray(batch["images"][0])
    assert img0[26, 26].mean() > 0.5  # inside the zoomed square
    assert abs(float(img0[5, 5].mean()) - 114 / 255) < 0.02  # letterbox gray outside


@pytest.mark.parametrize("family", ["v8", "v11", "v12"])
def test_fold_batchnorm_preserves_outputs(family):
    """BN folding (`fold_batchnorm` + `YOLO(fold_bn=True)`) must compute the
    same inference function: raw head outputs equal within reparameterisation
    rounding on random params with perturbed (non-identity) batch stats.

    v11/v12 matter separately: their PSA/area-attention blocks contain bare
    Conv+BatchNorm pairs that must NOT fold (the folded model still applies
    them from the surviving batch_stats subtree) — the shipped v11-OBB and
    v12 checkpoints load through this path (`detector_from_checkpoint`
    defaults `fold_bn=True`)."""
    import jax
    import numpy as np

    from icp_slam_yolo_tpu.models.yolo import YOLO, fold_batchnorm

    m0 = YOLO(num_classes=1, family=family)
    m1 = YOLO(num_classes=1, family=family, fold_bn=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    v = m0.init(jax.random.key(0), x)
    rng = np.random.default_rng(1)
    bs = jax.tree.map(lambda a: a + 0.1 * rng.standard_normal(a.shape).astype(a.dtype),
                      v["batch_stats"])
    o0 = m0.apply({"params": v["params"], "batch_stats": bs}, x, train=False)
    fp, fbs = fold_batchnorm(v["params"], bs)
    if family == "v8":
        assert fbs == {}  # v8 has no bare BatchNorms: everything folds
    else:
        assert jax.tree.leaves(fbs), f"{family} keeps its PSA/ABlock bare BatchNorms"
    o1 = m1.apply({"params": fp, "batch_stats": fbs}, x, train=False)
    for a, b in zip(jax.tree.leaves(o0), jax.tree.leaves(o1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def _greedy_nms_oracle(boxes, scores, classes, conf, iou_thr, k):
    """Sequential greedy NMS (the pre-fixpoint `lax.scan` semantics), in NumPy."""
    boxes, scores, classes = map(np.asarray, (boxes, scores, classes))
    cand = np.where(scores >= conf, scores, -1.0)
    order = np.argsort(-cand, kind="stable")[:k]
    tb, ts, tc = boxes[order], cand[order], classes[order]
    keep = np.zeros(len(order), bool)
    for i in range(len(order)):
        if ts[i] <= 0:
            continue
        suppressed = False
        for j in range(i):
            if keep[j] and tc[j] == tc[i]:
                lt = np.maximum(tb[i, :2], tb[j, :2])
                rb = np.minimum(tb[i, 2:], tb[j, 2:])
                wh = np.maximum(rb - lt, 0)
                inter = wh[0] * wh[1]
                area = lambda b: max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
                if inter / max(area(tb[i]) + area(tb[j]) - inter, 1e-9) > iou_thr:
                    suppressed = True
                    break
        keep[i] = not suppressed
    return tb[keep], ts[keep]


def test_nms_fixpoint_matches_sequential_greedy():
    """The while-loop fixpoint sweep must be EXACT greedy NMS, including
    suppression chains (A kills B, so B cannot kill C -> C is kept) on dense
    random overlapping boxes."""
    rng = np.random.default_rng(7)
    for trial in range(5):
        n = 64
        centers = rng.uniform(0, 60, (n, 2))  # dense field -> deep chains
        wh = rng.uniform(5, 25, (n, 2))
        boxes = np.concatenate([centers - wh / 2, centers + wh / 2], axis=1).astype(np.float32)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        classes = rng.integers(0, 2, n).astype(np.int32)
        det = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
                  conf_threshold=0.3, iou_threshold=0.4, max_detections=32)
        got_boxes = np.asarray(det.boxes)[np.asarray(det.valid)]
        want_boxes, want_scores = _greedy_nms_oracle(boxes, scores, classes, 0.3, 0.4, 32)
        assert len(got_boxes) == len(want_boxes), f"trial {trial}"
        # same survivor set (score-sorted in both)
        np.testing.assert_allclose(got_boxes, want_boxes, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(det.scores)[np.asarray(det.valid)], want_scores, atol=1e-6)


def test_nms_chain_unsuppression():
    """Three chained boxes: B overlaps A (suppressed), C overlaps B but not A
    -> greedy keeps A and C.  A single-pass matrix NMS would drop C."""
    boxes = jnp.asarray([[0.0, 0, 10, 10], [6, 0, 16, 10], [12, 0, 22, 10]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.zeros(3, jnp.int32)
    # IoU(A,B) = IoU(B,C) = 40/160 = 0.25, IoU(A,C) = 0
    det = nms(boxes, scores, classes, conf_threshold=0.25, iou_threshold=0.2, max_detections=3)
    valid = np.asarray(det.valid)
    kept = {tuple(np.asarray(det.boxes)[i].astype(int)) for i in range(3) if valid[i]}
    assert kept == {(0, 0, 10, 10), (12, 0, 22, 10)}


@pytest.mark.parametrize("task", ["detect", "obb", "segment", "pose"])
def test_decode_topk_path_matches_full_decode(task):
    """Detector's fast path (top-K before the per-anchor decode + fixpoint
    suppression) must produce the identical Detections as the general path
    (decode_predictions -> best_class -> nms), and its row-aligned extras
    must equal the full per-anchor extras gathered at the kept anchors."""
    det = Detector(num_classes=2, img_size=SIZE, task=task, conf_threshold=0.01,
                   iou_threshold=0.45, max_detections=16, compute_dtype=jnp.float32,
                   fold_bn=False)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(0, 1, (2, SIZE, SIZE, 3)), jnp.float32)
    fast, fast_extras, _ = det._predict(
        det.params, det.batch_stats, images, jnp.float32(0.01), jnp.float32(0.45))

    variables = {"params": det.params, "batch_stats": det.batch_stats}
    outs = det.model.apply(variables, images, train=False)
    if task == "segment":
        outs, _protos = outs
    boxes, scores, ref_extras = decode_predictions(outs, SIZE, task=task)

    def one(b, s):
        conf, cls = best_class(s)
        return nms(b, conf, cls, 0.01, 0.45, 16)

    ref = jax.vmap(one)(boxes, scores)
    np.testing.assert_array_equal(np.asarray(fast.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(fast.anchor_idx), np.asarray(ref.anchor_idx))
    np.testing.assert_array_equal(np.asarray(fast.classes), np.asarray(ref.classes))
    np.testing.assert_allclose(np.asarray(fast.boxes), np.asarray(ref.boxes), atol=1e-4)
    np.testing.assert_allclose(np.asarray(fast.scores), np.asarray(ref.scores), atol=1e-6)
    if task == "detect":
        assert fast_extras is None and ref_extras is None
        return
    # extras: fast path decodes winners only; rows align with Detections rows
    for b in range(2):
        valid = np.asarray(fast.valid[b])
        kept_anchor = np.asarray(fast.anchor_idx[b])[valid]
        got = np.asarray(fast_extras[b])[valid]
        want = np.asarray(ref_extras[b])[kept_anchor]
        np.testing.assert_allclose(got, want, atol=1e-5)
