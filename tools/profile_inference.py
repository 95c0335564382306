"""Break down streaming-inference cost per pipeline part on the local chip.

Usage: python tools/profile_inference.py [--size base] [--batch 8] [--T 21]

Times three jitted variants over identical inputs:
  1. backbone scan only,
  2. scan + gather + FPN/head (no NMS),
  3. the full eval step (scan + detect + NMS),
so the marginal cost of each part is visible. Completion is forced via
scalar fetches (block_until_ready does not wait on the tunneled backend).
"""
from __future__ import annotations

import argparse
import time
from dataclasses import replace

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, iters, *args):
    out = fn(*args)
    jax.tree.map(lambda x: None, out)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = fn(*args)
    first_leaf = jax.tree.leaves(last)[0]
    float(jnp.sum(first_leaf))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="base")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--T", type=int, default=21)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from rvt_tpu.config import preset
    from rvt_tpu.models import RVTDetector, init_detector, zero_states
    from rvt_tpu.models.detector import scan_backbone
    from rvt_tpu.ops.boxes import postprocess
    from rvt_tpu.training.step import gather_labeled_frames

    cfg = preset("gen1", args.size)
    cfg = replace(cfg, model=replace(cfg.model, compute_dtype=args.dtype))
    model, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                     batch_size=args.batch)
    H, W = cfg.model.backbone.in_res_hw
    pp = cfg.model.postprocess
    B, T = args.batch, args.T
    K = cfg.dataset.max_labeled_frames

    rng = np.random.RandomState(0)
    ev = jnp.asarray(rng.randint(0, 8, size=(T, B, H, W, 20)), jnp.float32)
    frame_valid = jnp.asarray((np.arange(T) % 5 == 4)[None].repeat(B, 0))
    states = zero_states(cfg.model.backbone, B)

    @jax.jit
    def backbone_only(variables, ev, states):
        feats, fs = scan_backbone(model, variables, ev, states, remat=False)
        return feats[0], fs

    @jax.jit
    def with_detect(variables, ev, states, frame_valid):
        feats, fs = scan_backbone(model, variables, ev, states, remat=False)
        gathered, frame_idx, gval = gather_labeled_frames(feats, frame_valid, K)
        preds = model.apply(variables, gathered, train=False,
                            method=RVTDetector.forward_detect)
        return preds, fs

    @jax.jit
    def full(variables, ev, states, frame_valid):
        feats, fs = scan_backbone(model, variables, ev, states, remat=False)
        gathered, frame_idx, gval = gather_labeled_frames(feats, frame_valid, K)
        preds = model.apply(variables, gathered, train=False,
                            method=RVTDetector.forward_detect)
        infer = jnp.concatenate([preds[..., :4],
                                 jax.nn.sigmoid(preds[..., 4:])], -1)
        dets, valid = postprocess(infer, cfg.model.head.num_classes,
                                  pp.confidence_threshold, pp.nms_threshold,
                                  pp.pre_nms_topk, pp.max_detections)
        return dets, fs

    t_bb = timeit(backbone_only, args.iters, variables, ev, states)
    t_det = timeit(with_detect, args.iters, variables, ev, states, frame_valid)
    t_full = timeit(full, args.iters, variables, ev, states, frame_valid)
    frames = B * T
    print(f"backbone scan : {t_bb*1e3:8.2f} ms/window  ({frames/t_bb:8.1f} fps)")
    print(f"+ fpn/head    : {t_det*1e3:8.2f} ms/window  ({frames/t_det:8.1f} fps)"
          f"  [detect {1e3*(t_det-t_bb):.2f} ms]")
    print(f"+ nms         : {t_full*1e3:8.2f} ms/window  ({frames/t_full:8.1f} fps)"
          f"  [nms {1e3*(t_full-t_det):.2f} ms]")


if __name__ == "__main__":
    main()
