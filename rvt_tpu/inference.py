"""End-to-end on-device inference: raw event streams -> detections.

BASELINE config 3 capability: unlike the reference (which voxelizes offline
on the host with numba/torch, scripts/genx/preprocess_dataset.py), this
pipeline runs everything inside one jit region per frame batch:

  raw events (padded [B, N] x/y/p/t + counts)
    -> stacked histogram (on TPU, by default, the Pallas sort+one-hot-
       matmul voxelizer: 1.8 ms per 8x32k-event batch on v5e, ~2x the
       XLA scatter path; other backends default to the XLA scatter.
       See docs/PERF.md)
    -> optional 2x nearest downsample (gen4)
    -> pad to model resolution
    -> recurrent detector step
    -> on-device NMS

Host never touches pixels; only the raw event arrays go up and the padded
detections come back.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rvt_tpu.config import ExperimentConfig
from rvt_tpu.models.backbone import LstmStates
from rvt_tpu.models.detector import RVTDetector
from rvt_tpu.ops.boxes import postprocess
from rvt_tpu.ops.voxelization import (stacked_histogram,
                                      stacked_histogram_pallas_batched)
from rvt_tpu.training.step import reset_states

Array = jax.Array


def nearest_downsample2(x: Array) -> Array:
    """[..., C, H, W] 2x nearest-exact downsample (preprocess parity:
    src = floor((dst + 0.5) * 2) = 2*dst + 1)."""
    return x[..., 1::2, 1::2]


def make_raw_inference_step(model: RVTDetector, cfg: ExperimentConfig,
                            use_pallas_voxelizer: Optional[bool] = None,
                            interpret: bool = False,
                            ds2_direct: bool = True):
    """Build a jitted step: (variables, states, events, counts,
    is_first_sample) -> (states, detections, det_valid).

    events: dict of x/y/p/t int32 [B, N] (t sorted per lane, zero padded);
    counts: [B] int32 valid-event counts. One event-repr frame per lane per
    call, recurrent states carried.

    ``use_pallas_voxelizer=None`` picks per backend: the Pallas kernel on
    TPU (~2x the XLA scatter, docs/PERF.md), the XLA scatter elsewhere.

    ``ds2_direct`` (gen4 / downsample_by_factor_2 configs): voxelize
    straight into the half-resolution grid instead of building the full
    1 Mpx histogram and then downsampling. The preprocess ds2 trick is
    nearest-exact with src = 2*dst + 1 (preprocess_dataset.py:467-477),
    so the downsampled histogram depends only on odd-coordinate events:
    filter to ``x%2==1 & y%2==1``, halve the coordinates, and scatter into
    the 360x640 grid — bit-identical by construction (the time-bin
    normalization uses only ``t``/``counts``, which are untouched; even-
    coordinate events are retargeted out of range so the voxelizer drops
    them without compacting the arrays) at ~4x less histogram-grid work.
    ``False`` keeps the voxelize-then-downsample path (parity oracle,
    tests/test_ops.py).
    """
    if use_pallas_voxelizer is None:
        use_pallas_voxelizer = jax.default_backend() not in ("cpu", "gpu")
    bins = 10  # stacked_histogram_dt=50_nbins=10 (dataset presets)
    sH, sW = cfg.dataset.resolution_hw
    ds2 = cfg.dataset.downsample_by_factor_2
    vH, vW = (sH // 2, sW // 2) if (ds2 and ds2_direct) else (sH, sW)
    in_res = cfg.model.backbone.in_res_hw
    pp = cfg.model.postprocess
    num_classes = cfg.model.head.num_classes
    assert not cfg.model.backbone.stem_s2d, \
        "raw pipeline emits HWC frames; use stem_s2d=False (device S2D TBD)"

    @jax.jit
    def step(variables, states: LstmStates, x: Array, y: Array, p: Array,
             t: Array, counts: Array, is_first_sample: Array):
        states = reset_states(states, is_first_sample)

        if ds2 and ds2_direct:
            odd = (x % 2 == 1) & (y % 2 == 1)
            # past-the-end x: > vW so both voxelizers drop it (the XLA
            # scatter drops via flat-index overflow with mode="drop")
            x = jnp.where(odd, x // 2, 2 * bins * vH * vW)
            y = jnp.where(odd, y // 2, vH)
        if use_pallas_voxelizer:
            frames = stacked_histogram_pallas_batched(
                x, y, p, t, counts, bins, vH, vW, interpret=interpret)
        else:
            frames = jax.vmap(
                lambda xi, yi, pi, ti, n: stacked_histogram(
                    xi, yi, pi, ti, n, bins, vH, vW)
            )(x, y, p, t, counts)  # [B, 2*bins, H, W]
        if ds2 and not ds2_direct:
            frames = nearest_downsample2(frames)
        frames = jnp.moveaxis(frames, 1, -1)  # -> NHWC
        H, W = frames.shape[1:3]
        frames = jnp.pad(frames, ((0, 0), (0, in_res[0] - H),
                                  (0, in_res[1] - W), (0, 0)))
        frames = frames.astype(jnp.float32)

        preds, new_states = model.apply(variables, frames, states)
        infer = jnp.concatenate([preds[..., :4],
                                 jax.nn.sigmoid(preds[..., 4:])], axis=-1)
        dets, valid = postprocess(infer, num_classes,
                                  pp.confidence_threshold, pp.nms_threshold,
                                  pp.pre_nms_topk, pp.max_detections)
        return new_states, dets, valid

    return step
