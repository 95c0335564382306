"""Component-level breakdown of the training step on the local chip.

Usage: python -m tools.profile_train_breakdown [--size tiny] [--dataset gen1]
       [--batch 8] [--iters 10] [--fused] [--trace DIR]

Splits the TBPTT train step (scan + gather + FPN/head + SimOTA loss +
backward + AdamW) into separately-jitted components so the time budget of
each is visible (the serving-side equivalent is tools/profile_fused):

  * backbone scan fwd+bwd   — value_and_grad through scan_backbone alone
  * FPN+head fwd+bwd        — forward_detect on pre-gathered features with
                              a dummy quadratic loss (no SimOTA)
  * SimOTA + losses          — value_and_grad of yolox_loss wrt the decoded
                              predictions (assignment + IoU/BCE terms)
  * optimizer                — optax update + apply_updates alone
  * full train step          — the real make_train_step, for reference

Components overlap at boundaries (e.g. the full step fuses head backward
into the backbone backward), so the parts need not sum exactly to the
whole; large gaps indicate fusion wins or losses. Timing protocol: the
full step chains iterations through the carried LSTM state; component
timings fetch the last result's scalar (in-order stream execution —
adequate for a breakdown; see tools/profile_fused.timeit).

--trace DIR additionally wraps a few full-step iterations in
jax.profiler.start_trace/stop_trace for xprof/tensorboard analysis.
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


def timeit(fn, iters, *args, chain=None):
    r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        if chain is not None:
            args = chain(r, args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="tiny")
    ap.add_argument("--dataset", default="gen1")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--trace", default=None,
                    help="write an xprof trace of the full step here")
    args = ap.parse_args()

    from rvt_tpu.config import preset
    from rvt_tpu.models import RVTDetector
    from rvt_tpu.models.backbone import zero_states
    from rvt_tpu.models.detector import scan_backbone
    from rvt_tpu.training import (init_train_state, make_optimizer,
                                  make_train_step)
    from rvt_tpu.training.losses import yolox_loss
    from rvt_tpu.training.step import (gather_labeled_frames, gather_labels,
                                       head_grid, pad_ev_repr)

    cfg = preset(args.dataset, args.size)
    mcfg = replace(cfg.model, compute_dtype="bfloat16")
    if args.fused:
        mcfg = replace(mcfg, backbone=replace(mcfg.backbone,
                                              fused_kernels=True))
    model = RVTDetector(cfg=mcfg)
    optimizer = make_optimizer(cfg.training)
    state = init_train_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    train_step = make_train_step(model, cfg, optimizer, donate=False)

    B, T = args.batch, cfg.dataset.sequence_length
    H, W = cfg.dataset.dataloading_hw
    M = cfg.dataset.max_labels_per_frame
    K = cfg.dataset.max_labeled_frames
    rng = np.random.RandomState(0)
    ev = jnp.asarray(rng.randint(0, 8, size=(B, T, H, W, 20)), jnp.uint8)
    labels_np = np.zeros((B, T, M, 7), np.float32)
    label_mask_np = np.zeros((B, T, M), bool)
    for t in range(4, T, 5):
        labels_np[:, t, :3] = [(0, 100.0, 80.0, 40.0, 30.0, 0.0, 1.0),
                               (0, 30.0, 40.0, 25.0, 20.0, 1.0, 1.0),
                               (0, 200.0, 120.0, 50.0, 35.0, 0.0, 1.0)]
        label_mask_np[:, t, :3] = True
    labels = jnp.asarray(labels_np)
    label_mask = jnp.asarray(label_mask_np)
    frame_valid = jnp.asarray(label_mask_np.any(-1))
    is_first = jnp.zeros((B,), bool)
    states0 = zero_states(cfg.model.backbone, B)
    in_res = cfg.model.backbone.in_res_hw

    # ---- full step (iterations chained through the LSTM carry) ----
    def full(s, st):
        _, new_st, m = train_step(s, st, ev, labels, label_mask, frame_valid,
                                  is_first)
        return m["loss"], new_st

    t_full = timeit(full, args.iters, state, states0,
                    chain=lambda r, a: (a[0], r[1]))
    print(f"full train step       : {t_full*1e3:7.1f} ms "
          f"({B*T/t_full:7.1f} frames/s)")

    # ---- backbone scan fwd+bwd ----
    def bb_loss(params, ev_in, st):
        variables = {"params": params, "batch_stats": state.batch_stats}
        ev_seq = jnp.swapaxes(pad_ev_repr(ev_in, in_res, jnp.float32), 0, 1)
        feats, _ = scan_backbone(model, variables, ev_seq, st,
                                 deterministic=False, remat=True)
        return sum(jnp.sum(f.astype(jnp.float32) ** 2) for f in feats)

    bb_grad = jax.jit(jax.grad(bb_loss))
    t_bb = timeit(bb_grad, args.iters, state.params, ev, states0)
    print(f"backbone scan fwd+bwd : {t_bb*1e3:7.1f} ms")

    # realistic gathered features for the detect components
    @jax.jit
    def fwd_feats(params, ev_in, st):
        variables = {"params": params, "batch_stats": state.batch_stats}
        ev_seq = jnp.swapaxes(pad_ev_repr(ev_in, in_res, jnp.float32), 0, 1)
        feats, _ = scan_backbone(model, variables, ev_seq, st,
                                 deterministic=True, remat=False)
        gathered, frame_idx, gval = gather_labeled_frames(feats, frame_valid,
                                                          K)
        return gathered, frame_idx, gval

    gathered, frame_idx, gval = fwd_feats(state.params, ev, states0)

    # ---- FPN + head fwd+bwd (no SimOTA) ----
    def head_loss(params, feats):
        variables = {"params": params, "batch_stats": state.batch_stats}
        preds, _ = model.apply(variables, feats, train=True,
                               method=RVTDetector.forward_detect,
                               mutable=["batch_stats"])
        return jnp.sum(preds.astype(jnp.float32) ** 2) * 1e-9

    head_grad = jax.jit(jax.grad(head_loss))
    t_head = timeit(head_grad, args.iters, state.params, gathered)
    print(f"FPN+head fwd+bwd      : {t_head*1e3:7.1f} ms")

    # ---- SimOTA + loss terms, grad wrt predictions ----
    grid_np, stride_np = head_grid(cfg)
    grid, strides = jnp.asarray(grid_np), jnp.asarray(stride_np)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    preds0 = model.apply(variables, gathered, train=False,
                         method=RVTDetector.forward_detect)
    yolox_labels, yl_mask = gather_labels(labels, label_mask, frame_idx)

    def ota_loss(preds):
        return yolox_loss(preds, yolox_labels, yl_mask, gval.reshape(-1),
                          grid, strides, cfg.model.head.num_classes)["loss"]

    ota_grad = jax.jit(jax.grad(ota_loss))
    t_ota = timeit(ota_grad, args.iters, preds0)
    print(f"SimOTA + loss fwd+bwd : {t_ota*1e3:7.1f} ms")

    # ---- optimizer alone ----
    grads = jax.tree.map(jnp.zeros_like, state.params)

    @jax.jit
    def opt_step(opt_state, params, grads):
        import optax

        updates, new_opt = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt

    t_opt = timeit(lambda p, o: opt_step(o, p, grads)[0], args.iters,
                   state.params, state.opt_state)
    print(f"optimizer (AdamW)     : {t_opt*1e3:7.1f} ms")
    print(f"components sum        : {(t_bb+t_head+t_ota+t_opt)*1e3:7.1f} ms "
          f"(vs full {t_full*1e3:.1f})")

    if args.trace:
        from rvt_tpu.utils.timers import profile_trace

        st = states0
        with profile_trace(args.trace):
            for _ in range(3):
                _, st, m = train_step(state, st, ev, labels, label_mask,
                                      frame_valid, is_first)
            float(m["loss"])
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
