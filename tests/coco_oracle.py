"""Test-only oracle: a second, independent implementation of the COCO bbox
evaluation protocol (the published COCOeval algorithm that pycocotools /
detectron2's COCOeval_opt implement — the evaluator the reference invokes at
/root/reference/utils/evaluation/prophesee/metrics/coco_eval.py:16-22).

Deliberately written in the spec's own shape — per-image dict records, a
[T, R, K, A, M] precision array with -1 sentinels, explicit python loops —
so it shares no code or structure with rvt_tpu/evaluation/coco.py. The fuzz
test in test_coco_eval.py asserts the two agree on all six headline stats;
a systematic bias in the production evaluator (the metric the mAP gate is
scored on) would show up here.

pycocotools itself is not installable in this image, hence an oracle
re-derived from the published algorithm instead of golden values.
"""
from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = [(0.0, 1e10), (0.0, 32.0 ** 2), (32.0 ** 2, 96.0 ** 2),
             (96.0 ** 2, 1e10)]
MAX_DETS = 100


def _bbox_iou_single(d, g):
    """IoU of two xywh boxes (maskUtils.iou, iscrowd=0, one pair)."""
    dx1, dy1, dw, dh = d
    gx1, gy1, gw, gh = g
    ix = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
    iy = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
    if ix <= 0 or iy <= 0:
        return 0.0
    inter = ix * iy
    union = dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


def _evaluate_img(gt_list, dt_list, area_rng, max_dets):
    """COCOeval.evaluateImg for one (image, category, areaRng, maxDets).

    gt_list/dt_list: lists of dicts with 'bbox' (xywh) and, for dts,
    'score'. Returns None when both are empty (like the spec)."""
    if len(gt_list) == 0 and len(dt_list) == 0:
        return None
    for g in gt_list:
        a = g["bbox"][2] * g["bbox"][3]
        g["_ignore"] = 1 if (a < area_rng[0] or a > area_rng[1]) else 0
    # sort gts: ignored last (stable); dts: score descending (stable)
    gtind = sorted(range(len(gt_list)), key=lambda i: gt_list[i]["_ignore"])
    gt = [gt_list[i] for i in gtind]
    dtind = sorted(range(len(dt_list)), key=lambda i: -dt_list[i]["score"])
    dt = [dt_list[i] for i in dtind[:max_dets]]

    T = len(IOU_THRS)
    G, D = len(gt), len(dt)
    gtm = [[0] * G for _ in range(T)]   # matched dt id (1-based), 0 = none
    dtm = [[0] * D for _ in range(T)]
    gt_ig = [g["_ignore"] for g in gt]
    dt_ig = [[0] * D for _ in range(T)]

    for tind, t in enumerate(IOU_THRS):
        for dind, d in enumerate(dt):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind, g in enumerate(gt):
                if gtm[tind][gind] > 0:
                    continue
                if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                    break
                v = _bbox_iou_single(d["bbox"], g["bbox"])
                if v < iou:
                    continue
                iou = v
                m = gind
            if m == -1:
                continue
            dt_ig[tind][dind] = gt_ig[m]
            dtm[tind][dind] = m + 1
            gtm[tind][m] = dind + 1
    # unmatched dts whose own area is outside the range are ignored
    for tind in range(T):
        for dind, d in enumerate(dt):
            a = d["bbox"][2] * d["bbox"][3]
            out = a < area_rng[0] or a > area_rng[1]
            if dtm[tind][dind] == 0 and out:
                dt_ig[tind][dind] = 1
    return {
        "dtMatches": np.array(dtm, np.float64),
        "dtIgnore": np.array(dt_ig, bool),
        "dtScores": np.array([d["score"] for d in dt]),
        "gtIgnore": np.array(gt_ig),
    }


def evaluate(gts, dts, num_classes):
    """COCOeval evaluate+accumulate+summarize for bbox.

    gts: per-image [N, 5] arrays (x, y, w, h, class_id);
    dts: per-image [M, 6] arrays (x, y, w, h, class_id, score).
    Returns the six headline stats.
    """
    num_imgs = len(gts)
    T, R, K, A = len(IOU_THRS), len(REC_THRS), num_classes, len(AREA_RNGS)
    precision = -np.ones((T, R, K, A))

    for k in range(K):
        per_img_gt = []
        per_img_dt = []
        for i in range(num_imgs):
            g_rows = gts[i][gts[i][:, 4] == k] if len(gts[i]) else np.zeros((0, 5))
            d_rows = dts[i][dts[i][:, 4] == k] if len(dts[i]) else np.zeros((0, 6))
            per_img_gt.append([{"bbox": list(map(float, r[:4]))}
                               for r in g_rows])
            per_img_dt.append([{"bbox": list(map(float, r[:4])),
                                "score": float(r[5])} for r in d_rows])
        for a, area_rng in enumerate(AREA_RNGS):
            E = [_evaluate_img([dict(g) for g in per_img_gt[i]],
                               per_img_dt[i], area_rng, MAX_DETS)
                 for i in range(num_imgs)]
            E = [e for e in E if e is not None]
            if len(E) == 0:
                continue
            dt_scores = np.concatenate([e["dtScores"] for e in E])
            inds = np.argsort(-dt_scores, kind="mergesort")
            dtm = np.concatenate([e["dtMatches"] for e in E], axis=1)[:, inds]
            dt_ig = np.concatenate([e["dtIgnore"] for e in E], axis=1)[:, inds]
            gt_ig = np.concatenate([e["gtIgnore"] for e in E])
            npig = int(np.count_nonzero(gt_ig == 0))
            if npig == 0:
                continue
            tps = np.logical_and(dtm > 0, np.logical_not(dt_ig))
            fps = np.logical_and(dtm == 0, np.logical_not(dt_ig))
            tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
            for t in range(T):
                tp, fp = tp_sum[t], fp_sum[t]
                nd = len(tp)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                q = np.zeros(R)
                pr = pr.tolist()
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds_r = np.searchsorted(rc, REC_THRS, side="left")
                for ri, pi in enumerate(inds_r):
                    try:
                        q[ri] = pr[pi]
                    except IndexError:
                        pass
                precision[t, :, k, a] = np.array(q)

    def _summ(t_slice, a_idx):
        s = precision[t_slice, :, :, a_idx]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else 0.0

    return {
        "AP": _summ(slice(None), 0),
        "AP_50": _summ(slice(0, 1), 0),
        "AP_75": _summ(slice(5, 6), 0),
        "AP_S": _summ(slice(None), 1),
        "AP_M": _summ(slice(None), 2),
        "AP_L": _summ(slice(None), 3),
    }
