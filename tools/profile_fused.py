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


def timeit(fn, iters, *args):
    r = fn(*args)
    float(jnp.sum(jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
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
    from rvt_tpu.models.detector import fused_scan_backbone
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

    # full eval step
    raw_hw = (H, W)
    ev_raw = rng.randint(0, 8, size=(B, T) + raw_hw + (20,)).astype(np.uint8)
    ev = jnp.asarray(host_space_to_depth(ev_raw, (H, W)))
    frame_valid = jnp.asarray(
        (np.arange(T) % label_every == label_every - 1)[None].repeat(B, 0))
    is_first = jnp.zeros((B,), bool)
    states = zero_states(bb, B)
    eval_step = make_eval_step(model, cfg)
    t_full = timeit(lambda *a: eval_step(*a)[1], args.iters,
                    variables, states, ev, frame_valid, is_first)
    print(f"full eval step      : {t_full*1e3:7.2f} ms/window "
          f"({B*T/t_full:7.1f} fps)")

    # backbone alone
    ev_t = jnp.swapaxes(ev, 0, 1)

    @jax.jit
    def bb_only(variables, ev_t, states):
        feats, fs = fused_scan_backbone(model, variables, ev_t, states)
        return feats[0], fs

    t_bb = timeit(bb_only, args.iters, variables, ev_t, states)
    print(f"fused backbone scan : {t_bb*1e3:7.2f} ms/window "
          f"[detect+nms+gather {1e3*(t_full-t_bb):.2f} ms]")

    # per-stage: conv vs stage kernel
    p = variables["params"]["backbone"]
    x = ev_t.reshape((T * B,) + ev_t.shape[2:])
    from rvt_tpu.ops.s2d import fold_stem_kernel
    dtype = jnp.bfloat16
    for idx in range(bb.num_stages):
        sp = p[f"stage{idx + 1}"]
        is_stem = idx == 0
        w = jnp.asarray(sp["downsample"]["conv"]["kernel"], jnp.float32)
        if is_stem and bb.stem_s2d:
            w2, strides, pad = fold_stem_kernel(w), (1, 1), [(0, 0), (0, 0)]
        else:
            k = w.shape[0]
            strides = (2, 2)
            pad = ([(k // 2, k // 2)] * 2 if bb.downsample.overlap
                   else [(0, 0)] * 2)
            w2 = w

        @jax.jit
        def conv(x, w2=w2, strides=strides, pad=pad):
            return jax.lax.conv_general_dilated(
                x.astype(dtype), w2.astype(dtype), strides, pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t_conv = timeit(conv, args.iters, x)
        x = conv(x)
        h_dim, w_dim, C = x.shape[1:]
        x_seq = x.reshape(T, B, h_dim, w_dim, C)
        lpar = sp["lstm"]["conv1x1"]
        lw = jnp.asarray(lpar["kernel"], dtype).reshape(2 * C, 4 * C)
        lb = jnp.asarray(lpar["bias"], dtype).reshape(1, -1)
        h0, c0 = zero_states(bb, B)[idx]
        if bb.downsample.norm_affine:
            ln_prm = (jnp.asarray(sp["downsample"]["norm"]["scale"],
                                  dtype).reshape(1, -1),
                      jnp.asarray(sp["downsample"]["norm"]["bias"],
                                  dtype).reshape(1, -1))
        else:
            ln_prm = (jnp.ones((1, C), dtype), jnp.zeros((1, C), dtype))
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
            fn = jax.jit(lambda xs, mode=mode, pw=pw, pg=pg, lw=lw, lb=lb,
                         h0=h0, c0=c0, common=common: fused_stage_scan(
                             xs, pw, pg, lw, lb, h0, c0,
                             dense=mode == "dense", **common))
        elif mode == "split":
            fn = jax.jit(lambda xs, pw=pw, pg=pg, lw=lw, lb=lb, h0=h0,
                         c0=c0, common=common: split_stage_scan(
                             xs, pw, pg, lw, lb, h0, c0, **common))
        else:
            print(f"stage{idx+1}: mode={mode} (per-step fallback) — skipped")
            continue
        t_k = timeit(lambda xs: fn(xs)[0], args.iters, x_seq)
        h_seq = fn(x_seq)[0]
        x = h_seq.reshape(T * B, h_dim, w_dim, C).astype(dtype)
        print(f"stage{idx+1} ({h_dim}x{w_dim}x{C}, {mode:5s}): "
              f"conv {t_conv*1e3:6.2f} ms  kernel {t_k*1e3:6.2f} ms")


if __name__ == "__main__":
    main()
