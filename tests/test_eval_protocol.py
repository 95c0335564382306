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


def _match_times_pointer_walk(all_ts, gt_boxes, dt_boxes, time_tol):
    """Oracle: the reference protocol's incremental pointer walk
    (utils/evaluation/prophesee/metrics/coco_eval.py:55-90), kept here
    test-only to fuzz the vectorized searchsorted implementation."""
    gt_size, dt_size = len(gt_boxes), len(dt_boxes)
    windowed_gt, windowed_dt = [], []
    low_gt = high_gt = low_dt = high_dt = 0
    for ts in all_ts:
        while low_gt < gt_size and gt_boxes[low_gt]["t"] < ts:
            low_gt += 1
        high_gt = max(low_gt, high_gt)
        while high_gt < gt_size and gt_boxes[high_gt]["t"] <= ts:
            high_gt += 1
        low, high = ts - time_tol, ts + time_tol
        while low_dt < dt_size and dt_boxes[low_dt]["t"] < low:
            low_dt += 1
        high_dt = max(low_dt, high_dt)
        while high_dt < dt_size and dt_boxes[high_dt]["t"] <= high:
            high_dt += 1
        windowed_gt.append(gt_boxes[low_gt:high_gt])
        windowed_dt.append(dt_boxes[low_dt:high_dt])
    return windowed_gt, windowed_dt


def test_match_times_fuzz_vs_pointer_walk():
    """Vectorized match_times == the protocol pointer walk on random
    time-sorted buffers (including duplicate timestamps, empty windows,
    and boxes outside every window)."""
    rng = np.random.RandomState(42)
    for trial in range(50):
        n_gt = rng.randint(0, 40)
        n_dt = rng.randint(0, 60)
        tol = int(rng.choice([1, 10_000, 50_000]))
        gt = np.zeros(n_gt, BBOX_DTYPE)
        dt = np.zeros(n_dt, BBOX_DTYPE)
        # coarse grid -> plenty of duplicate timestamps
        gt["t"] = np.sort(rng.randint(0, 20, n_gt)) * 25_000
        dt["t"] = np.sort(rng.randint(0, 20, n_dt)) * 25_000
        gt["w"] = rng.randint(1, 100, n_gt)
        dt["w"] = rng.randint(1, 100, n_dt)
        all_ts = np.unique(gt["t"]) if n_gt else np.zeros(0, np.int64)
        got_g, got_d = match_times(all_ts, gt, dt, tol)
        exp_g, exp_d = _match_times_pointer_walk(all_ts, gt, dt, tol)
        assert len(got_g) == len(exp_g) == len(got_d) == len(exp_d)
        for a, b in zip(got_g + got_d, exp_g + exp_d):
            np.testing.assert_array_equal(a, b)


def test_filter_boxes_fuzz_mask_semantics():
    """filter_boxes == the reference mask formula (t > skip, min side,
    squared diagonal) on random boxes including exact-threshold values."""
    rng = np.random.RandomState(7)
    for _ in range(20):
        n = rng.randint(0, 50)
        b = np.zeros(n, BBOX_DTYPE)
        b["t"] = rng.randint(0, int(1.2e6), n)
        b["w"] = rng.choice([5, 10, 12, 20, 21.21, 30, 40], n)
        b["h"] = rng.choice([5, 10, 12, 20, 21.21, 30, 40], n)
        out = filter_boxes(b, int(5e5), 30, 10)
        ref_mask = ((b["t"] > int(5e5))
                    & (b["w"] ** 2 + b["h"] ** 2 >= 30 ** 2)
                    & (b["w"] >= 10) & (b["h"] >= 10))
        np.testing.assert_array_equal(out, b[ref_mask])
