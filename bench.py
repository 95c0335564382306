"""Benchmark: RVT-B streaming inference throughput on one chip.

Prints ONE JSON line: event-frames/second for the flagship model (RVT-Base,
Gen1 geometry 256x320, batch-8 streaming, bfloat16 serving precision)
running the full per-frame pipeline on device: recurrent backbone step +
PAFPN + YOLOX head + box decode + confidence filter + class-aware NMS.

Timing note: on the tunneled TPU backend, ``block_until_ready`` returns
before execution finishes; completion is forced by fetching a scalar
checksum of the final iteration's detections (sequential LSTM-state chain
makes all iterations data-dependent).

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
WARMUP = 3
ITERS = 50


def build_step(dtype):
    from rvt_tpu.config import preset
    from rvt_tpu.models import init_detector, zero_states
    from rvt_tpu.ops import postprocess
    from rvt_tpu.utils.precision import cast_params_bf16

    cfg = preset("gen1", "base")
    model, variables = init_detector(cfg.model, jax.random.PRNGKey(0),
                                     batch_size=BATCH)
    if dtype == jnp.bfloat16:
        variables = cast_params_bf16(variables)
    H, W = cfg.model.backbone.in_res_hw
    pp = cfg.model.postprocess
    num_classes = cfg.model.head.num_classes

    @jax.jit
    def step(variables, x, states):
        preds, new_states = model.apply(variables, x, states)
        infer = jnp.concatenate([preds[..., :4],
                                 jax.nn.sigmoid(preds[..., 4:])], axis=-1)
        dets, valid = postprocess(infer, num_classes,
                                  pp.confidence_threshold, pp.nms_threshold,
                                  pp.pre_nms_topk, pp.max_detections)
        return dets, valid, new_states

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 8, size=(BATCH, H, W, 20)), dtype)
    states = jax.tree.map(lambda s: s.astype(dtype),
                          zero_states(cfg.model.backbone, BATCH))
    return step, variables, x, states


def measure(dtype) -> float:
    step, variables, x, states = build_step(dtype)
    for _ in range(WARMUP):
        dets, valid, states = step(variables, x, states)
    float(jnp.sum(dets))  # force warmup completion

    t0 = time.perf_counter()
    for _ in range(ITERS):
        dets, valid, states = step(variables, x, states)
    checksum = float(jnp.sum(dets))  # forces the whole dependent chain
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return BATCH * ITERS / dt


def main() -> None:
    fps = measure(jnp.bfloat16)
    print(json.dumps({
        "metric": "rvt_b_gen1_inference_throughput_bf16",
        "value": round(fps, 2),
        "unit": "event-frames/s/chip",
        "vs_baseline": round(fps / TARGET_FPS, 4),
    }))


if __name__ == "__main__":
    main()
