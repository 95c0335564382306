"""Micro-benchmark backbone internals: per-stage cost, scan overhead.

python -m tools.profile_backbone [--size base] [--batch 8]
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
    ap.add_argument("--size", default="base")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from rvt_tpu.config import preset
    from rvt_tpu.models import RVTDetector, init_detector, zero_states
    from rvt_tpu.models.backbone import RVTStage
    from rvt_tpu.models.detector import scan_backbone

    cfg = preset("gen1", args.size)
    cfg = replace(cfg, model=replace(cfg.model, compute_dtype="bfloat16"))
    model, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                     batch_size=args.batch)
    bb = cfg.model.backbone
    H, W = bb.in_res_hw
    B = args.batch
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 8, size=(B, H, W, 20)), jnp.float32)
    states = zero_states(bb, B)

    # whole backbone, single step
    @jax.jit
    def single_step(variables, x, states):
        feats, new_states = model.apply(variables, x, states, None, True,
                                        method=RVTDetector.forward_backbone)
        return feats[4], new_states

    t1 = timeit(single_step, args.iters, variables, x, states)
    print(f"backbone single step : {t1*1e3:7.2f} ms")

    # scan over T=21
    ev = jnp.asarray(rng.randint(0, 8, size=(21, B, H, W, 20)), jnp.float32)

    @jax.jit
    def scan21(variables, ev, states):
        feats, fs = scan_backbone(model, variables, ev, states, remat=False)
        return feats[0], fs

    t2 = timeit(scan21, max(args.iters // 4, 2), variables, ev, states)
    print(f"backbone scan x21    : {t2*1e3:7.2f} ms  ({t2/21*1e3:.2f} ms/step; "
          f"single-step x21 = {t1*21*1e3:.2f} ms)")

    # per-stage
    dims = bb.stage_dims
    strides = bb.strides
    x_in = x
    for i in range(4):
        stage = RVTStage(dim_out=dims[i],
                         downsample_factor=bb.stem_patch_size if i == 0 else 2,
                         num_blocks=bb.num_blocks[i], enable_token_masking=False,
                         cfg=bb, dtype=jnp.bfloat16)
        params = variables["params"]["backbone"][f"stage{i + 1}"]
        h_c = states[i]

        @jax.jit
        def stage_fn(p, xi, hc, stage=stage):
            return stage.apply({"params": p}, xi, hc)

        t = timeit(stage_fn, args.iters, params, x_in, h_c)
        print(f"stage{i+1} ({x_in.shape[1]}x{x_in.shape[2]}x{x_in.shape[3]}"
              f" -> /{strides[i]} d{dims[i]}): {t*1e3:7.2f} ms")
        x_in, _ = stage_fn(params, x_in, h_c)


if __name__ == "__main__":
    main()
