"""Fuzz the production COCO evaluator against the independent test-only
oracle (tests/coco_oracle.py — a literal transcription of the published
COCOeval bbox algorithm, the metric implementation the reference relies on
via pycocotools/detectron2 at coco_eval.py:16-22).

The production evaluator is what the mAP gate is scored on; a systematic
deviation here would silently eat the <=0.2 mAP budget (round-1 VERDICT
missing #3). Covers ignored GTs, area-range boundaries, maxDets truncation,
duplicate scores, empty images, and absent categories.
"""
import numpy as np
import pytest

from rvt_tpu.evaluation.coco import evaluate_coco_map
from tests import coco_oracle

STATS = ("AP", "AP_50", "AP_75", "AP_S", "AP_M", "AP_L")


def _assert_match(gts, dts, num_classes, seed=None):
    got = evaluate_coco_map(gts, dts, num_classes)
    want = coco_oracle.evaluate(gts, dts, num_classes)
    for k in STATS:
        np.testing.assert_allclose(got[k], want[k], atol=1e-9,
                                   err_msg=f"{k} (seed={seed})")


def _random_scene(rng, num_classes):
    """Random multi-image scene mixing area buckets, noisy copies of GTs,
    pure-noise detections, and duplicate scores."""
    num_imgs = rng.integers(1, 5)
    gts, dts = [], []
    for _ in range(num_imgs):
        n_gt = rng.integers(0, 7)
        g = np.zeros((n_gt, 5))
        # spread areas across small (<32^2), medium, large buckets incl.
        # values straddling the exact boundaries
        side = rng.choice([8, 20, 31.9, 32.1, 60, 95, 97, 150], 2 * n_gt)
        g[:, 2] = side[:n_gt]
        g[:, 3] = side[n_gt:]
        g[:, 0] = rng.uniform(0, 400, n_gt)
        g[:, 1] = rng.uniform(0, 300, n_gt)
        g[:, 4] = rng.integers(0, num_classes, n_gt)

        n_noise = rng.integers(0, 5)
        rows = []
        for k in range(n_gt):
            if rng.random() < 0.7:  # noisy copy of a GT
                r = np.zeros(6)
                r[:4] = g[k, :4] + rng.normal(0, 3, 4)
                r[2:4] = np.maximum(r[2:4], 1.0)
                r[4] = g[k, 4] if rng.random() < 0.8 else rng.integers(
                    0, num_classes)
                r[5] = rng.choice([0.9, 0.7, 0.7, 0.5, rng.uniform(0.1, 1)])
                rows.append(r)
        for _ in range(n_noise):
            r = np.zeros(6)
            r[0] = rng.uniform(0, 400)
            r[1] = rng.uniform(0, 300)
            r[2] = rng.uniform(2, 120)
            r[3] = rng.uniform(2, 120)
            r[4] = rng.integers(0, num_classes)
            r[5] = rng.choice([0.7, rng.uniform(0.05, 1)])  # duplicate scores
            rows.append(r)
        d = np.stack(rows) if rows else np.zeros((0, 6))
        gts.append(g)
        dts.append(d)
    return gts, dts


@pytest.mark.parametrize("seed", range(200))
def test_fuzz_parity_with_oracle(seed):
    rng = np.random.default_rng(seed)
    num_classes = int(rng.integers(1, 4))
    gts, dts = _random_scene(rng, num_classes)
    _assert_match(gts, dts, num_classes, seed=seed)


def test_maxdets_truncation():
    """>100 detections in one image must be truncated to the top-100 by
    score before matching (COCOeval maxDets)."""
    rng = np.random.default_rng(99)
    g = np.array([[50, 50, 40, 40, 0], [150, 150, 50, 50, 0]], float)
    rows = []
    for i in range(140):
        rows.append([rng.uniform(0, 300), rng.uniform(0, 300),
                     rng.uniform(5, 60), rng.uniform(5, 60), 0,
                     rng.uniform(0.01, 0.99)])
    # the true matches ride at mid-range scores so truncation matters
    rows.append([50, 50, 40, 40, 0, 0.5])
    rows.append([150, 150, 50, 50, 0, 0.005])  # below many noise scores
    _assert_match([g], [np.array(rows)], 1)


def test_all_gts_ignored_in_small_range():
    """Category with only large GTs: AP_S must exclude it (npig == 0)."""
    g = np.array([[10, 10, 120, 120, 0]], float)
    d = np.array([[10, 10, 120, 120, 0, 0.9],
                  [200, 200, 10, 10, 0, 0.8]], float)
    _assert_match([g], [d], 2)  # class 1 entirely absent as well


def test_empty_everything():
    got = evaluate_coco_map([np.zeros((0, 5))], [np.zeros((0, 6))], 2)
    for k in STATS:
        assert got[k] == 0.0


def test_perfect_detections_ap_one():
    rng = np.random.default_rng(3)
    gts, dts = [], []
    for _ in range(3):
        n = rng.integers(1, 4)
        g = np.zeros((n, 5))
        g[:, 0] = rng.uniform(0, 200, n)
        g[:, 1] = rng.uniform(0, 200, n)
        g[:, 2] = rng.uniform(40, 90, n)
        g[:, 3] = rng.uniform(40, 90, n)
        d = np.concatenate([g[:, :4], g[:, 4:5],
                            rng.uniform(0.5, 1, (n, 1))], axis=1)
        gts.append(g)
        dts.append(d)
    got = evaluate_coco_map(gts, dts, 1)
    assert got["AP"] == pytest.approx(1.0)
    _assert_match(gts, dts, 1)
