"""Golden-value COCO fixture with HAND-DERIVED expected stats.

The production evaluator (rvt_tpu/evaluation/coco.py) and the fuzz oracle
(tests/coco_oracle.py) are both builder-written; their 200-scene equality
proves internal consistency, not fidelity to the published COCOeval
algorithm (pycocotools is not installable here). This fixture closes the
common-mode risk: a scene set small enough that every matching decision
and the final integrals are derived BY HAND from the published algorithm
(pycocotools cocoeval.py evaluateImg/accumulate), with exact rational
expected values. Both implementations must reproduce them.

Scene (1 category, 3 images; IoUs chosen to sit safely between the
0.50:0.05:0.95 thresholds — never on one):

  img0: GT g1 [0,0,20,20]   (area 400, small);   det d1 = g1,  score .9
  img1: GT g2 [0,0,50,50]   (area 2500, medium); det d2 = g2,  score .8
  img2: GT g3 [0,0,120,120] (area 14400, large); det d3 = g3 shifted
        +36 px in x -> inter 84*120, union 2*14400-10080, IoU = 10080/18720
        = 0.53846 (matches ONLY thr 0.50);                    score .7
        det d4 [200,200,10,10] (area 100), no overlap,        score .6

Derivation of the expected stats:

* area 'all' (3 GT; score order d1, d2, d3, d4):
  - thr .50: d1 TP, d2 TP, d3 TP, d4 FP -> recall hits 1.0 with
    precision 1.0 at every recall point -> AP = 1.
  - thr .55..:.95 (9 thrs): d1 TP, d2 TP, d3 FP, d4 FP ->
    rc = [1/3, 2/3, 2/3, 2/3], pr envelope = [1, 1, 2/3, 1/2];
    101-point integral: recThrs 0.00..0.66 (67 points) read precision 1,
    0.67..1.00 (34 points) read 0 -> AP = 67/101.
  - AP   = (1 + 9 * 67/101) / 10 = 704/1010
  - AP_50 = 1, AP_75 = 67/101
* area 'small' ([0, 32^2]; only g1 counted, g2/g3 ignored):
  d1 TP; d2/d3 match ignored GTs (or are out-of-range unmatched) ->
  ignored; d4 unmatched IN-range -> FP after d1; precision at recall 1.0
  is still 1.0 (envelope) -> AP_S = 1.
* area 'medium' ([32^2, 96^2]; only g2 counted): d2 perfect, every other
  det ignored (matched-ignored or out-of-range unmatched) -> AP_M = 1.
* area 'large' ([96^2, 1e5^2]; only g3 counted): d3 TP at thr .50 only
  (IoU .538), FP at the 9 higher thrs with no TPs -> AP_L = (1+0*9)/10.
"""
import numpy as np

EXPECTED = {
    "AP": 704.0 / 1010.0,
    "AP_50": 1.0,
    "AP_75": 67.0 / 101.0,
    "AP_S": 1.0,
    "AP_M": 1.0,
    "AP_L": 0.1,
}


def _scene():
    gts = [
        np.array([[0.0, 0.0, 20.0, 20.0, 0.0]]),
        np.array([[0.0, 0.0, 50.0, 50.0, 0.0]]),
        np.array([[0.0, 0.0, 120.0, 120.0, 0.0]]),
    ]
    dts = [
        np.array([[0.0, 0.0, 20.0, 20.0, 0.0, 0.9]]),
        np.array([[0.0, 0.0, 50.0, 50.0, 0.0, 0.8]]),
        np.array([[36.0, 0.0, 120.0, 120.0, 0.0, 0.7],
                  [200.0, 200.0, 10.0, 10.0, 0.0, 0.6]]),
    ]
    return gts, dts


def test_production_evaluator_matches_golden():
    from rvt_tpu.evaluation.coco import evaluate_coco_map

    got = evaluate_coco_map(*_scene(), num_classes=1)
    for k, v in EXPECTED.items():
        np.testing.assert_allclose(got[k], v, atol=1e-12, err_msg=k)


def test_oracle_matches_golden():
    from tests.coco_oracle import evaluate as oracle_evaluate

    gts, dts = _scene()
    got = oracle_evaluate(gts, dts, num_classes=1)
    for k, v in EXPECTED.items():
        np.testing.assert_allclose(got[k], v, atol=1e-12, err_msg=k)


def test_iou_of_fixture_is_between_thresholds():
    """The d3/g3 IoU must sit strictly between the .50 and .55 thresholds
    (never exactly on one) so float rounding cannot flip a match."""
    from rvt_tpu.evaluation.coco import iou_xywh

    iou = iou_xywh(np.array([[36.0, 0.0, 120.0, 120.0]]),
                   np.array([[0.0, 0.0, 120.0, 120.0]]))[0, 0]
    assert 0.52 < iou < 0.545
