"""Benchmark the raw-events -> detections pipeline on TPU.

BASELINE config-3 capability: voxelize raw event arrays on device
(Pallas sort+one-hot voxelizer), run the recurrent detector step and
on-device NMS — all in one jit region per frame batch (latency-serving
mode: one frame per lane per dispatch, states carried).

    python -m tools.profile_raw [--dataset gen1] [--size base]
        [--batch 8] [--fused] [--xla_voxelizer]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen1", choices=["gen1", "gen4"])
    ap.add_argument("--size", default="base")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--events", type=int, default=32768,
                    help="events per frame per lane")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--fused", action="store_true",
                    help="serve with the fused Pallas backbone kernels")
    ap.add_argument("--xla_voxelizer", action="store_true",
                    help="XLA scatter voxelizer instead of the Pallas one")
    ap.add_argument("--no_ds2_direct", action="store_true",
                    help="voxelize at full sensor resolution then "
                         "downsample (the pre-round-4 gen4 path) instead "
                         "of voxelizing odd-coordinate events straight "
                         "into the ds2 grid")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rvt_tpu.config import preset
    from rvt_tpu.inference import make_raw_inference_step
    from rvt_tpu.models import init_detector, zero_states

    cfg = preset(args.dataset, args.size)
    cfg = replace(cfg, model=replace(
        cfg.model, compute_dtype="bfloat16",
        backbone=replace(cfg.model.backbone, fused_kernels=args.fused)))
    model, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                     batch_size=args.batch)
    step = make_raw_inference_step(
        model, cfg, use_pallas_voxelizer=not args.xla_voxelizer,
        ds2_direct=not args.no_ds2_direct,
        interpret=jax.default_backend() == "cpu")

    H, W = cfg.dataset.resolution_hw
    B, N = args.batch, args.events
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, W, (B, N)), jnp.int32)
    y = jnp.asarray(rng.randint(0, H, (B, N)), jnp.int32)
    p = jnp.asarray(rng.randint(0, 2, (B, N)), jnp.int32)
    t = jnp.asarray(np.sort(rng.randint(0, 50_000, (B, N)), axis=1), jnp.int32)
    counts = jnp.full((B,), N - 17, jnp.int32)
    is_first = jnp.zeros((B,), bool)
    states = zero_states(cfg.model.backbone, B)

    for _ in range(3):
        states, dets, valid = step(variables, states, x, y, p, t, counts,
                                   is_first)
    float(jnp.sum(dets))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        states, dets, valid = step(variables, states, x, y, p, t, counts,
                                   is_first)
    checksum = float(jnp.sum(dets))
    dt = (time.perf_counter() - t0) / args.iters
    assert np.isfinite(checksum)
    print(f"raw pipeline {args.dataset}-{args.size} batch {B} "
          f"{'fused' if args.fused else 'xla'} "
          f"{'pallas-vox' if not args.xla_voxelizer else 'xla-vox'}: "
          f"{dt * 1e3:.2f} ms/batch-frame -> {B / dt:.1f} frames/s "
          f"({dt / B * 1e3:.2f} ms/frame latency-equivalent)")


if __name__ == "__main__":
    main()
