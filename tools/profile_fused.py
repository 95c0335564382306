"""Per-stage breakdown of the FUSED serving path on the local chip.

python -m tools.profile_fused [--dataset gen1] [--size base] [--batch 8]

Times, per stage: the batched downsample conv (XLA) and the stage-scan
kernel (Pallas), plus the full fused eval step for reference, so the
marginal cost of each part of the serving window is visible. Completion
is forced via scalar fetches (block_until_ready does not wait on the
tunneled backend).
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
    """Mean s/iter. ``chain(result, args) -> args`` threads a data
    dependency between iterations (bench.py's carried-LSTM-state pattern)
    so the final scalar fetch forces the WHOLE chain on the tunneled
    backend, where block_until_ready returns early. Call sites with a
    natural carry (states) pass chain; the stateless downsample convs run
    unchained — there the last-dispatch fetch relies on the backend's
    in-order stream execution, adequate for a profiling breakdown."""
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
    ap.add_argument("--dataset", default="gen1")
    ap.add_argument("--size", default="base")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from rvt_tpu.config import preset
    from rvt_tpu.models import init_detector, zero_states
    from rvt_tpu.models.detector import (downsample_conv_apply,
                                         downsample_ln_params,
                                         fused_scan_backbone)
    from rvt_tpu.ops.fused_attention import (attention_block_params,
                                             stage_fusion_mode)
    from rvt_tpu.ops.fused_scan import (fused_stage_scan, split_stage_scan)
    from rvt_tpu.ops.s2d import host_space_to_depth
    from rvt_tpu.training.step import make_eval_step

    cfg = preset(args.dataset, args.size)
    T = 21 if args.dataset == "gen1" else 5
    cfg = replace(cfg, model=replace(
        cfg.model, compute_dtype="bfloat16",
        backbone=replace(cfg.model.backbone, stem_s2d=True,
                         fused_kernels=True),
        postprocess=replace(cfg.model.postprocess, pre_nms_topk=512)))
    B = args.batch
    model, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                     batch_size=B)
    bb = cfg.model.backbone
    H, W = bb.in_res_hw
    rng = np.random.RandomState(0)
    label_every = 5 if args.dataset == "gen1" else 2

    # full eval step. Synthetic events at the DATASET raw resolution
    # (bench.py convention: gen1 240x304, gen4 360x640) so the padded
    # border is zero as in production.
    raw_hw = (240, 304) if args.dataset == "gen1" else (360, 640)
    ev_raw = rng.randint(0, 8, size=(B, T) + raw_hw + (20,)).astype(np.uint8)
    ev = jnp.asarray(host_space_to_depth(ev_raw, (H, W)))
    frame_valid = jnp.asarray(
        (np.arange(T) % label_every == label_every - 1)[None].repeat(B, 0))
    is_first = jnp.zeros((B,), bool)
    states = zero_states(bb, B)
    eval_step = make_eval_step(model, cfg)
    # chain each iteration through the returned LSTM states so the final
    # fetch forces the whole chain (tunneled-backend timing protocol)
    t_full = timeit(lambda v, s, e, fv, i: eval_step(v, s, e, fv, i)[:2],
                    args.iters, variables, states, ev, frame_valid, is_first,
                    chain=lambda r, a: (a[0], r[0]) + a[2:])
    print(f"full eval step      : {t_full*1e3:7.2f} ms/window "
          f"({B*T/t_full:7.1f} fps)")

    # backbone alone
    ev_t = jnp.swapaxes(ev, 0, 1)

    @jax.jit
    def bb_only(variables, ev_t, states):
        feats, fs = fused_scan_backbone(model, variables, ev_t, states)
        return feats[0], fs

    t_bb = timeit(bb_only, args.iters, variables, ev_t, states,
                  chain=lambda r, a: a[:2] + (r[1],))
    print(f"fused backbone scan : {t_bb*1e3:7.2f} ms/window "
          f"[detect+nms+gather {1e3*(t_full-t_bb):.2f} ms]")

    # Per-stage: conv vs stage kernel. The stage decomposition below
    # mirrors models/detector.py:fused_scan_backbone (the conv/LN param
    # extraction is IMPORTED from there so the two cannot desynchronize;
    # the mode dispatch must be kept in sync with it by hand).
    p = variables["params"]["backbone"]
    x = ev_t.reshape((T * B,) + ev_t.shape[2:])
    dtype = jnp.bfloat16
    for idx in range(bb.num_stages):
        sp = p[f"stage{idx + 1}"]
        is_stem = idx == 0

        conv = jax.jit(lambda x, sp=sp, is_stem=is_stem:
                       downsample_conv_apply(x, sp, bb, is_stem, dtype))
        t_conv = timeit(conv, args.iters, x)
        x = conv(x)
        h_dim, w_dim, C = x.shape[1:]
        x_seq = x.reshape(T, B, h_dim, w_dim, C)
        lpar = sp["lstm"]["conv1x1"]
        lw = jnp.asarray(lpar["kernel"], dtype).reshape(2 * C, 4 * C)
        lb = jnp.asarray(lpar["bias"], dtype).reshape(1, -1)
        h0, c0 = zero_states(bb, B)[idx]
        ln_prm = downsample_ln_params(sp, bb, C, dtype)
        mode = stage_fusion_mode(h_dim, w_dim, C,
                                 tuple(bb.attention.partition_size),
                                 scan=True)
        common = dict(heads=C // bb.attention.dim_head,
                      dim_head=bb.attention.dim_head,
                      part=tuple(bb.attention.partition_size),
                      eps=bb.attention.norm_eps,
                      ds_ln_params=ln_prm, ds_eps=bb.downsample.norm_eps)
        pw = attention_block_params(sp["block0"]["att_window"], True)
        pg = attention_block_params(sp["block0"]["att_grid"], False)
        if mode in ("part", "dense"):
            fn = jax.jit(lambda xs, h0, c0, mode=mode, pw=pw, pg=pg, lw=lw,
                         lb=lb, common=common: fused_stage_scan(
                             xs, pw, pg, lw, lb, h0, c0,
                             dense=mode == "dense", **common))
        elif mode == "split":
            fn = jax.jit(lambda xs, h0, c0, pw=pw, pg=pg, lw=lw, lb=lb,
                         common=common: split_stage_scan(
                             xs, pw, pg, lw, lb, h0, c0, **common))
            # leg breakdown: batched attention pair vs whole-window LSTM
            # scan (the split composition's two kernel launches)
            from rvt_tpu.ops.fused_attention import fused_attention_pair
            from rvt_tpu.ops.fused_scan import fused_lstm_scan

            pair_fn = jax.jit(
                lambda xs, pw=pw, pg=pg, common=common:
                fused_attention_pair(
                    xs.reshape(T * B, xs.shape[2], xs.shape[3],
                               xs.shape[4]),
                    pw, pg, heads=common["heads"],
                    dim_head=common["dim_head"], part=common["part"],
                    skip_first_norm=True, eps=common["eps"],
                    ds_ln_params=common["ds_ln_params"],
                    ds_eps=common["ds_eps"]))
            t_pair = timeit(pair_fn, args.iters, x_seq)
            y_pair = pair_fn(x_seq).reshape(T, B, h_dim, w_dim,
                                            C).astype(dtype)
            lstm_fn = jax.jit(lambda ys, h0, c0, lw=lw, lb=lb:
                              fused_lstm_scan(ys, lw, lb, h0, c0))
            t_lstm = timeit(lstm_fn, args.iters, y_pair, h0, c0,
                            chain=lambda r, a: (a[0], r[1], r[2]))
            print(f"stage{idx+1} split legs: attention-pair "
                  f"{t_pair*1e3:6.2f} ms  lstm-scan {t_lstm*1e3:6.2f} ms")
        else:
            print(f"stage{idx+1}: mode={mode} (per-step fallback) — skipped;"
                  " NOTE: later stages are timed on this stage's raw conv"
                  " output (correct shapes, unrepresentative values — fine"
                  " for timing)")
            continue
        # chain the (hT, cT) carry between iterations (same protocol)
        t_k = timeit(fn, args.iters, x_seq, h0, c0,
                     chain=lambda r, a: (a[0], r[1], r[2]))
        h_seq = fn(x_seq, h0, c0)[0]
        x = h_seq.reshape(T * B, h_dim, w_dim, C).astype(dtype)
        print(f"stage{idx+1} ({h_dim}x{w_dim}x{C}, {mode:5s}): "
              f"conv {t_conv*1e3:6.2f} ms  kernel {t_k*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
