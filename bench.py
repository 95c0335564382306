"""Benchmark: RVT-B streaming inference throughput on one chip.

Prints ONE JSON line: event-frames/second for the flagship model (RVT-Base,
Gen1 geometry 256x320, bfloat16 serving precision) on the deployment hot
path: a jitted streaming step that scans a batch of 8 lanes over a 21-frame
window (recurrent backbone per frame via lax.scan) and runs PAFPN + YOLOX
head + box decode + confidence filter + class-aware NMS on the gathered
labelled frames — the same compiled step the evaluator uses
(rvt_tpu/training/step.py:make_eval_step).

Timing note: on the tunneled TPU backend, ``block_until_ready`` returns
before execution finishes; completion is forced by fetching a scalar
checksum (all iterations are data-dependent through the LSTM-state chain).

vs_baseline: ratio against the BASELINE.json target of 3x a single A100
running the reference. The reference paper (arXiv:2212.05598) claims
< 12 ms/frame on a T4 for RVT-B (~85 fps); an A100 is ~2.5x a T4 on this
workload => reference A100 ~= 210 fps, so the target is ~630 event-frames/s.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET_FPS = 630.0  # 3x estimated single-A100 reference throughput
BATCH = 8
SEQ_LEN = 21  # gen1 TBPTT window
WARMUP = 2
ITERS = 20
# v5e peak dense bf16 (nominal; a big calibration matmul reaches
# ~182 TFLOP/s on this chip, docs/PERF.md round-1 table)
V5E_PEAK_TFLOPS = 197.0


def _measure(dataset: str, raw_hw, seq_len: int, label_every: int) -> float:
    """Streaming-eval throughput (event-frames/s) for RVT-B on one dataset
    geometry with the fused serving path."""
    from dataclasses import replace

    from rvt_tpu.config import preset
    from rvt_tpu.models import init_detector, zero_states
    from rvt_tpu.training.step import make_eval_step

    from rvt_tpu.ops.s2d import host_space_to_depth

    cfg = preset(dataset, "base")
    cfg = replace(cfg, model=replace(
        cfg.model, compute_dtype="bfloat16",
        backbone=replace(cfg.model.backbone, stem_s2d=True,
                         fused_kernels=True),
        # The serving latency knob (documented in PostprocessConfig): the
        # exact default (0 = NMS all anchors) is measured for accuracy by
        # the mAP gate; here the bench runs RANDOM-init weights, where
        # most of the 1680 anchors pass the 0.1 confidence filter — a
        # candidate load no trained detector produces. 512 matches the
        # deployment config (~5x the realistic post-threshold count).
        postprocess=replace(cfg.model.postprocess, pre_nms_topk=512)))
    model, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                     batch_size=BATCH)
    H, W = cfg.model.backbone.in_res_hw

    eval_step = make_eval_step(model, cfg)

    rng = np.random.RandomState(0)
    ev_raw = rng.randint(
        0, 8, size=(BATCH, seq_len) + raw_hw + (20,)).astype(np.uint8)
    # host-side pad + space-to-depth (runs in the prefetcher in production)
    ev = jnp.asarray(host_space_to_depth(ev_raw, (H, W)))
    # realistic label cadence (gen1: 4 Hz labels vs 20 Hz frames; gen4:
    # 10 Hz vs 20 Hz)
    frame_valid = jnp.asarray(
        (np.arange(seq_len) % label_every == label_every - 1)
        [None].repeat(BATCH, 0))
    is_first = jnp.zeros((BATCH,), bool)
    states = zero_states(cfg.model.backbone, BATCH)

    for _ in range(WARMUP):
        states, dets, det_valid, frame_idx, gval = eval_step(
            variables, states, ev, frame_valid, is_first)
    float(jnp.sum(dets))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        states, dets, det_valid, frame_idx, gval = eval_step(
            variables, states, ev, frame_valid, is_first)
    checksum = float(jnp.sum(dets))  # forces the dependent chain
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return BATCH * seq_len * ITERS / dt


def _mfu(dataset: str, fps: float) -> tuple:
    """(achieved TFLOP/s, % of v5e bf16 peak) at this frame rate, using
    the analytic per-frame model FLOPs (utils/flops.py, cross-checked
    against XLA cost analysis in tests/test_model_misc.py)."""
    from rvt_tpu.config import preset
    from rvt_tpu.utils.flops import detector_flops_per_frame

    per_frame = detector_flops_per_frame(preset(dataset, "base").model)
    tflops = fps * per_frame["total"] / 1e12
    return round(tflops, 2), round(100.0 * tflops / V5E_PEAK_TFLOPS, 2)


def main() -> None:
    import sys

    fps = _measure("gen1", (240, 304), SEQ_LEN, 5)
    print(f"gen1: {fps:.1f} f/s", file=sys.stderr, flush=True)
    tflops, mfu_pct = _mfu("gen1", fps)
    out = {
        "metric": "rvt_b_gen1_streaming_inference_throughput_bf16",
        "value": round(fps, 2),
        "unit": "event-frames/s/chip",
        "vs_baseline": round(fps / TARGET_FPS, 4),
        "tflops": tflops,
        "mfu_pct": mfu_pct,
    }
    # secondary surface: gen4 (1 Mpx ds2, 384x640 model, 5-frame window).
    # Never let it take down the primary metric line (the remote compile
    # helper occasionally returns transient 500s/SIGKILLs).
    try:
        g4 = _measure("gen4", (360, 640), 5, 2)
        out["gen4_streaming_fps"] = round(g4, 2)
        out["gen4_tflops"], out["gen4_mfu_pct"] = _mfu("gen4", g4)
    except Exception as e:  # pragma: no cover - transient-compile guard
        out["gen4_error"] = type(e).__name__
    print(json.dumps(out))


if __name__ == "__main__":
    main()
