"""mAP evaluation: synthetic cases with known AP."""

import numpy as np

from icp_slam_yolo_tpu.models.eval import average_precision, evaluate_detections


def test_perfect_detections():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 70, 70]]), "classes": np.array([0, 0])}]
    pred = [{
        "boxes": np.array([[0, 0, 10, 10], [50, 50, 70, 70]]),
        "scores": np.array([0.9, 0.8]),
        "classes": np.array([0, 0]),
    }]
    m = evaluate_detections(pred, gt)
    assert m["mAP50"] > 0.99
    assert m["mAP50_95"] > 0.99
    assert m["precision"] == 1.0 and m["recall"] == 1.0


def test_missed_and_false_positive():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 70, 70]]), "classes": np.array([0, 0])}]
    pred = [{
        "boxes": np.array([[0, 0, 10, 10], [200, 200, 210, 210]]),
        "scores": np.array([0.9, 0.8]),
        "classes": np.array([0, 0]),
    }]
    m = evaluate_detections(pred, gt)
    assert 0.2 < m["mAP50"] < 0.6  # one of two gts found, one FP
    assert m["recall"] == 0.5


def test_localization_quality_affects_high_iou():
    gt = [{"boxes": np.array([[0.0, 0, 100, 100]]), "classes": np.array([0])}]
    pred = [{
        "boxes": np.array([[5.0, 5, 105, 105]]),  # IoU ~0.82
        "scores": np.array([0.9]),
        "classes": np.array([0]),
    }]
    m = evaluate_detections(pred, gt)
    assert m["mAP50"] > 0.99        # passes at 0.5
    assert m["mAP50_95"] < 0.8      # fails at 0.85+


def test_average_precision_ordering():
    # two detections, high-scoring one is the TP -> AP 1.0 for 1 gt
    ap = average_precision(np.array([True, False]), np.array([0.9, 0.5]), 1)
    assert ap > 0.99
    # reversed: FP outranks TP -> AP ~0.5
    ap2 = average_precision(np.array([False, True]), np.array([0.9, 0.5]), 1)
    assert 0.3 < ap2 < 0.7


def test_multiclass_averaging():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]]), "classes": np.array([0, 1])}]
    pred = [{
        "boxes": np.array([[0, 0, 10, 10]]),
        "scores": np.array([0.9]),
        "classes": np.array([0]),
    }]
    m = evaluate_detections(pred, gt)
    # class 0 perfect, class 1 absent -> mean 0.5
    assert abs(m["mAP50"] - 0.5) < 0.01


def test_evaluate_obb_detector_fake(tmp_path):
    """evaluate_obb_detector with a scripted detector: perfect box at a known
    0.1 rad angle offset -> AP 1.0, angle error ~5.73 deg."""
    from PIL import Image

    from icp_slam_yolo_tpu.models.eval import evaluate_obb_detector

    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    Image.new("RGB", (64, 64)).save(tmp_path / "images" / "a.jpg")
    (tmp_path / "labels" / "a.txt").write_text("0 0.2 0.2 0.8 0.2 0.8 0.8 0.2 0.8\n")

    def fake(img):
        return {
            "boxes": np.array([[12.8, 12.8, 51.2, 51.2]]),
            "scores": np.array([0.9]),
            "classes": np.array([0]),
            "angles": np.array([0.1]),
        }

    m = evaluate_obb_detector(fake, str(tmp_path))
    assert m["mAP50"] > 0.99
    assert abs(m["angle_error_mean_deg"] - np.degrees(0.1)) < 0.1
    assert m["val_images"] == 1


def test_evaluate_pose_detector_fake(tmp_path):
    """evaluate_pose_detector with a scripted detector: corners 1 px off the
    labeled ones -> corner error 1 px, PCK@0.1 = 1, recall 1."""
    from PIL import Image

    from icp_slam_yolo_tpu.models.eval import evaluate_pose_detector

    Image.new("RGB", (64, 64)).save(tmp_path / "a.jpg")
    lbl = tmp_path / "a.txt"
    lbl.write_text("0 0.5 0.5 0.5 0.5 0.3 0.3 2 0.7 0.3 2 0.7 0.7 2 0.3 0.7 2\n")
    gt_px = np.array([[19.2, 19.2], [44.8, 19.2], [44.8, 44.8], [19.2, 44.8]])

    def fake(img):
        kpts = np.concatenate([gt_px + np.array([1.0, 0.0]), np.ones((4, 1))], axis=1)
        return {
            "boxes": np.array([[12.8, 12.8, 51.2, 51.2]]),
            "scores": np.array([0.9]),
            "classes": np.array([0]),
            "keypoints": kpts[None],
        }

    m = evaluate_pose_detector(fake, [(str(tmp_path / "a.jpg"), str(lbl))])
    assert m["detection_recall"] == 1.0
    assert abs(m["corner_err_mean_px"] - 1.0) < 1e-6
    assert m["pck_0.1"] == 1.0
