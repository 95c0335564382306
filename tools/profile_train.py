"""Training-step throughput on the local chip(s).

Usage: python -m tools.profile_train [--size tiny] [--dataset gen1]
       [--batch 8] [--iters 10]

Measures full TBPTT train-step time (scan + SimOTA loss + backward + AdamW)
at the shipped window geometry, with synthetic data. Completion forced by
fetching the loss scalar each step (the tunneled backend's
block_until_ready does not wait).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="tiny")
    ap.add_argument("--dataset", default="gen1")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--fused", action="store_true",
                    help="custom-VJP Pallas train kernels (ops/fused_train)")
    args = ap.parse_args()

    from rvt_tpu.config import preset
    from rvt_tpu.models import RVTDetector
    from rvt_tpu.models.backbone import zero_states
    from rvt_tpu.training import (init_train_state, make_optimizer,
                                  make_train_step)

    cfg = preset(args.dataset, args.size)
    cfg = replace(cfg, training=replace(cfg.training, precision=args.precision))
    compute = "bfloat16" if args.precision in ("bf16", "bfloat16") else "float32"
    mcfg = replace(cfg.model, compute_dtype=compute)
    if args.fused:
        mcfg = replace(mcfg, backbone=replace(mcfg.backbone,
                                              fused_kernels=True))
    model = RVTDetector(cfg=mcfg)
    optimizer = make_optimizer(cfg.training)
    state = init_train_state(model, cfg, optimizer, jax.random.PRNGKey(0))
    train_step = make_train_step(model, cfg, optimizer, donate=False)

    B = args.batch
    T = cfg.dataset.sequence_length
    H, W = cfg.dataset.dataloading_hw
    M = cfg.dataset.max_labels_per_frame
    rng = np.random.RandomState(0)
    ev = jnp.asarray(rng.randint(0, 8, size=(B, T, H, W, 20)), jnp.uint8)
    labels = np.zeros((B, T, M, 7), np.float32)
    label_mask = np.zeros((B, T, M), bool)
    for t in range(4, T, 5):
        labels[:, t, :3] = [(0, 100.0, 80.0, 40.0, 30.0, 0.0, 1.0),
                            (0, 30.0, 40.0, 25.0, 20.0, 1.0, 1.0),
                            (0, 200.0, 120.0, 50.0, 35.0, 0.0, 1.0)]
        label_mask[:, t, :3] = True
    frame_valid = jnp.asarray(label_mask.any(-1))
    labels = jnp.asarray(labels)
    label_mask = jnp.asarray(label_mask)
    is_first = jnp.zeros((B,), bool)
    states = zero_states(cfg.model.backbone, B)

    # warmup/compile
    state, states_out, metrics = train_step(state, states, ev, labels,
                                            label_mask, frame_valid, is_first)
    print("compiled; loss =", float(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, states_out, metrics = train_step(state, states_out, ev, labels,
                                                label_mask, frame_valid,
                                                is_first)
    loss = float(metrics["loss"])  # forces the chain
    dt = (time.perf_counter() - t0) / args.iters
    print(f"train step: {dt*1e3:.1f} ms  ({B * T / dt:.1f} frames/s, "
          f"{1 / dt:.2f} steps/s)  loss={loss:.4f}")


if __name__ == "__main__":
    main()
