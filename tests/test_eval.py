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
