"""Tests for the Prophesee protocol + numpy COCO evaluator."""
import numpy as np

from rvt_tpu.evaluation.coco import evaluate_coco_map, iou_xywh
from rvt_tpu.evaluation.prophesee import (BBOX_DTYPE, PropheseeEvaluator,
                                          filter_boxes, match_times)


def _boxes(rows):
    arr = np.zeros(len(rows), BBOX_DTYPE)
    for i, r in enumerate(rows):
        arr[i]["t"], arr[i]["x"], arr[i]["y"], arr[i]["w"], arr[i]["h"], \
            arr[i]["class_id"], arr[i]["class_confidence"] = r
    return arr


def test_filter_boxes():
    boxes = _boxes([
        (100, 0, 0, 50, 50, 0, 1.0),        # too early (t <= 0.5 s)
        (600_000, 0, 0, 5, 50, 0, 1.0),     # side too small
        (600_000, 0, 0, 12, 12, 0, 1.0),    # diag too small (<30)
        (600_000, 0, 0, 40, 40, 0, 1.0),    # keep
    ])
    out = filter_boxes(boxes, int(5e5), 30, 10)
    assert len(out) == 1 and out[0]["w"] == 40


def test_match_times_window():
    gt = _boxes([(1_000_000, 0, 0, 10, 10, 0, 1.0),
                 (2_000_000, 0, 0, 10, 10, 0, 1.0)])
    dt = _boxes([(960_000, 1, 1, 10, 10, 0, 0.9),     # within 50 ms of 1.0s
                 (1_500_000, 1, 1, 10, 10, 0, 0.9),    # matches nothing
                 (2_049_000, 1, 1, 10, 10, 0, 0.9)])   # within 50 ms of 2.0s
    gw, dw = match_times(np.unique(gt["t"]), gt, dt, 50_000)
    assert len(gw) == 2
    assert len(dw[0]) == 1 and dw[0][0]["t"] == 960_000
    assert len(dw[1]) == 1 and dw[1][0]["t"] == 2_049_000


def test_coco_iou():
    a = np.array([[0.0, 0, 10, 10]])
    b = np.array([[0.0, 0, 10, 10], [5, 5, 10, 10]])
    iou = iou_xywh(a, b)[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175])


def test_coco_perfect_detection_ap1():
    gts, dts = [], []
    rng = np.random.RandomState(0)
    for _ in range(10):
        n = rng.randint(1, 4)
        g = np.zeros((n, 5))
        g[:, 0] = rng.uniform(0, 200, n)
        g[:, 1] = rng.uniform(0, 150, n)
        g[:, 2] = rng.uniform(40, 80, n)   # areas in 'all'+'medium/large'
        g[:, 3] = rng.uniform(40, 80, n)
        g[:, 4] = rng.randint(0, 2, n)
        d = np.concatenate([g, np.full((n, 1), 0.9)], axis=1)
        gts.append(g)
        dts.append(d)
    m = evaluate_coco_map(gts, dts, num_classes=2)
    assert m["AP"] > 0.99
    assert m["AP_50"] > 0.99


def test_coco_half_detections():
    """One of two GTs detected at every image -> recall 0.5, precision 1."""
    gts, dts = [], []
    for i in range(10):
        g = np.array([[10.0, 10, 50, 50, 0], [100.0, 100, 50, 50, 0]])
        d = np.array([[10.0, 10, 50, 50, 0, 0.9]])
        gts.append(g)
        dts.append(d)
    m = evaluate_coco_map(gts, dts, num_classes=2)
    # AP with precision 1 up to recall 0.5: 101-pt interpolation gives ~0.505
    assert 0.45 < m["AP"] < 0.56
    # class 1 has no GTs anywhere -> excluded from the mean (not zeroed)
    assert m["AP_50"] > 0.45


def test_coco_false_positives_reduce_precision():
    gts, dts = [], []
    for _ in range(5):
        g = np.array([[10.0, 10, 50, 50, 0]])
        d = np.array([[10.0, 10, 50, 50, 0, 0.9],
                      [200.0, 10, 50, 50, 0, 0.95]])  # confident FP
        gts.append(g)
        dts.append(d)
    m = evaluate_coco_map(gts, dts, num_classes=1)
    assert 0.45 < m["AP"] < 0.56  # FP ranked first halves AP


def test_coco_small_area_bucket():
    gts = [np.array([[10.0, 10, 20, 20, 0]])]          # small (400 < 1024)
    dts = [np.array([[10.0, 10, 20, 20, 0, 0.9]])]
    m = evaluate_coco_map(gts, dts, num_classes=1)
    assert m["AP_S"] > 0.99
    assert m["AP_L"] == 0.0  # no large GTs -> NaN bucket -> reported 0


def test_prophesee_evaluator_end_to_end():
    ev = PropheseeEvaluator("gen1")
    gt = _boxes([(1_000_000, 50, 50, 60, 40, 0, 1.0)])
    pred = _boxes([(1_000_000, 52, 51, 58, 39, 0, 0.85)])
    ev.add_labels([gt])
    ev.add_predictions([pred])
    m = ev.evaluate_buffer(img_height=240, img_width=304)
    assert m["AP"] > 0.5
    ev.reset_buffer()
    assert not ev.has_data()
