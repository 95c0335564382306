"""Benchmark the Prophesee/COCO evaluator at TEST-SET scale.

The reference leans on C-accelerated pycocotools because Gen1/1Mpx test
sets are ~20k+ labelled frames (reference evaluator.py:9-72,
coco_eval.py:16-22). This synthesizes a gen1-test-like buffer (default
20k frames, ~25 boxes/frame predicted -> ~500k det boxes) and times one
full `evaluate_buffer` call, so per-10k-step validation and the mAP gate
stay practical (round-2 VERDICT target: < 60 s full-set).

    python -m tools.bench_evaluator [--frames 20000] [--dets_per_frame 25]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_buffer(num_frames: int, dets_per_frame: int, seed: int = 0):
    """gen1-test-like labels + detections: 1-6 GT boxes/frame, detections
    = jittered GT (some dropped) + false positives, realistic box sizes."""
    from rvt_tpu.evaluation.prophesee import BBOX_DTYPE

    rng = np.random.RandomState(seed)
    H, W = 240, 304
    gt_frames, dt_frames = [], []
    for j in range(num_frames):
        t_us = 600_000 + j * 50_000
        m = rng.randint(1, 7)
        gt = np.zeros(m, BBOX_DTYPE)
        gt["t"] = t_us
        gt["w"] = rng.uniform(12, 90, m)
        gt["h"] = rng.uniform(12, 70, m)
        gt["x"] = rng.uniform(0, W - 40, m)
        gt["y"] = rng.uniform(0, H - 30, m)
        gt["class_id"] = rng.randint(0, 2, m)
        gt["class_confidence"] = 1.0

        keep = rng.rand(m) < 0.85
        hit = gt[keep].copy()
        hit["x"] += rng.uniform(-4, 4, keep.sum())
        hit["y"] += rng.uniform(-4, 4, keep.sum())
        hit["class_confidence"] = rng.uniform(0.3, 0.99, keep.sum())
        n_fp = max(0, dets_per_frame - len(hit))
        fp = np.zeros(n_fp, BBOX_DTYPE)
        fp["t"] = t_us
        fp["w"] = rng.uniform(12, 90, n_fp)
        fp["h"] = rng.uniform(12, 70, n_fp)
        fp["x"] = rng.uniform(0, W - 40, n_fp)
        fp["y"] = rng.uniform(0, H - 30, n_fp)
        fp["class_id"] = rng.randint(0, 2, n_fp)
        fp["class_confidence"] = rng.uniform(0.05, 0.6, n_fp)
        dt = np.concatenate([hit, fp])
        gt_frames.append(gt)
        dt_frames.append(np.sort(dt, order="t"))
    return gt_frames, dt_frames


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20_000)
    ap.add_argument("--dets_per_frame", type=int, default=25)
    ap.add_argument("--chunk", type=int, default=500,
                    help="frames per add_* call (mimics eval-loop batching)")
    args = ap.parse_args()

    from rvt_tpu.evaluation.prophesee import PropheseeEvaluator

    t0 = time.perf_counter()
    gt_frames, dt_frames = make_buffer(args.frames, args.dets_per_frame)
    n_gt = sum(len(g) for g in gt_frames)
    n_dt = sum(len(d) for d in dt_frames)
    print(f"synthesized {args.frames} frames: {n_gt} GT boxes, "
          f"{n_dt} det boxes ({time.perf_counter() - t0:.1f}s)")

    ev = PropheseeEvaluator("gen1")
    for i in range(0, args.frames, args.chunk):
        ev.add_labels(gt_frames[i:i + args.chunk])
        ev.add_predictions(dt_frames[i:i + args.chunk])

    t0 = time.perf_counter()
    metrics = ev.evaluate_buffer(240, 304)
    dt = time.perf_counter() - t0
    print({k: round(v, 4) for k, v in metrics.items()})
    print(f"evaluate_buffer: {dt:.2f} s for {args.frames} frames "
          f"({n_dt} dets) -> {args.frames / dt:.0f} frames/s")


if __name__ == "__main__":
    main()
