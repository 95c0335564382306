"""Streaming evaluation loop: datasets -> batches -> jitted eval step ->
Prophesee COCO metrics.

Equivalent of ``validation.py`` + ``Module._val_test_step_impl`` +
``Module.run_psee_evaluator`` (modules/detection.py:208-338): runs the
recurrent model over every recording with carried LSTM state, collects
detections at labelled frames, and evaluates with the Prophesee protocol.
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional

import numpy as np

from rvt_tpu.config import ExperimentConfig
from rvt_tpu.data.types import Batch
from rvt_tpu.evaluation.prophesee import (PropheseeEvaluator,
                                          detections_to_structured,
                                          labels_to_structured)
from rvt_tpu.models.backbone import zero_states
from rvt_tpu.models.detector import RVTDetector
from rvt_tpu.training.step import make_eval_step


def _write_panel(path, ev_hwc: np.ndarray, gt, pred, labelmap) -> None:
    """Render one labelled frame ([H, W, C] uint8 storage layout) with GT
    and prediction overlays and save it as PNG."""
    from PIL import Image

    from rvt_tpu.utils.visualization import render_detections

    img = render_detections(np.moveaxis(ev_hwc, -1, 0), gt, pred, labelmap)
    Image.fromarray(img).save(str(path))


def iter_batch_detections(batch: Batch, dets: np.ndarray,
                          det_valid: np.ndarray, frame_idx: np.ndarray,
                          gval: np.ndarray):
    """Convert one window's device outputs to Prophesee-protocol arrays.

    Yields (lane, t_step, gt, pred) for every labelled frame: gt/pred are
    BBOX_DTYPE structured arrays stamped with the label frame's time
    (reference to_prophesee, io/box_loading.py:58-99). Shared by the
    streaming eval loop and the trainer's train-time detection metrics.
    """
    for b in range(batch.batch_size):
        for k in range(frame_idx.shape[1]):
            if not gval[b, k]:
                continue
            t_step = int(frame_idx[b, k])
            mask = batch.label_mask[b, t_step]
            labels = batch.labels[b, t_step][mask]
            if len(labels) == 0:
                continue
            time_us = int(labels[0, 0])
            gt = labels_to_structured(labels)
            pred = detections_to_structured(dets[b, k], det_valid[b, k],
                                            time_us)
            yield b, t_step, gt, pred


def run_streaming_eval(model: RVTDetector, variables, cfg: ExperimentConfig,
                       batches: Iterable[Batch],
                       batch_size: int,
                       viz_dir=None, viz_every: int = 50,
                       mesh=None) -> Optional[Dict[str, float]]:
    """Evaluate over an iterable of stream batches (all same batch size).

    Returns the Prophesee COCO metrics dict or None if no labels were seen.

    viz_dir: if set, writes a pred-vs-GT panel PNG for every viz_every-th
    labelled frame (reference DetectionVizCallback image grids,
    callbacks/detection.py:32-100).

    mesh: data-parallel mesh for sharded eval — needed for the fused
    serving kernels to engage on >1 device (see step.make_eval_step).
    """
    eval_step = make_eval_step(model, cfg, mesh=mesh)
    evaluator = PropheseeEvaluator(cfg.dataset.name,
                                   cfg.dataset.downsample_by_factor_2)
    states = zero_states(cfg.model.backbone, batch_size)
    stem_s2d = model.cfg.backbone.stem_s2d
    if stem_s2d:
        from rvt_tpu.ops.s2d import host_space_to_depth
    if viz_dir is not None:
        from pathlib import Path

        from rvt_tpu.utils.visualization import (LABELMAP_GEN1,
                                                 LABELMAP_GEN4_SHORT,
                                                 render_detections)
        viz_dir = Path(viz_dir)
        viz_dir.mkdir(parents=True, exist_ok=True)
        labelmap = (LABELMAP_GEN4_SHORT if cfg.dataset.name == "gen4"
                    else LABELMAP_GEN1)
    frames_seen = 0

    def consume(batch: Batch, outputs) -> None:
        """Convert one window's device outputs to protocol arrays (host)."""
        nonlocal frames_seen
        dets, det_valid, frame_idx, gval = [np.asarray(o) for o in outputs]
        gt_list, pred_list = [], []
        for b, t_step, gt, pred in iter_batch_detections(
                batch, dets, det_valid, frame_idx, gval):
            gt_list.append(gt)
            pred_list.append(pred)
            if viz_dir is not None and frames_seen % viz_every == 0:
                _write_panel(viz_dir / f"frame_{frames_seen:06d}.png",
                             batch.ev_repr[b, t_step], gt, pred, labelmap)
            frames_seen += 1
        if gt_list:
            evaluator.add_labels(gt_list)
            evaluator.add_predictions(pred_list)

    # one-window lag: host-side conversion of window N overlaps the device
    # computing window N+1 (dispatch is async; fetches happen in consume)
    pending = None
    K = cfg.dataset.max_labeled_frames
    for batch in batches:
        assert batch.batch_size == batch_size
        # gather_labeled_frames silently drops labelled frames beyond K;
        # in eval that would leave GT frames without predictions and skew
        # the protocol metric — fail loudly instead.
        # ValueError (not assert): this guard must survive `python -O` —
        # silently dropping GT frames would skew the protocol metric.
        n_lab = int(batch.frame_valid.sum(axis=1).max())
        if n_lab > K:
            raise ValueError(
                f"window has {n_lab} labelled frames > max_labeled_frames="
                f"{K}; raise DatasetConfig.max_labeled_frames")
        ev = batch.ev_repr
        if stem_s2d:
            ev = host_space_to_depth(ev, cfg.model.backbone.in_res_hw)
        states, dets, det_valid, frame_idx, gval = eval_step(
            variables, states,
            ev, batch.frame_valid, batch.is_first_sample)
        if pending is not None:
            consume(*pending)
        pending = (batch, (dets, det_valid, frame_idx, gval))
    if pending is not None:
        consume(*pending)

    # multi-host: merge every process's shard so all processes evaluate the
    # identical full set (reference reduces the metric across ranks instead,
    # modules/detection.py:319-334). No-op single-process.
    from rvt_tpu.parallel.multihost import merge_evaluator_buffers

    merge_evaluator_buffers(evaluator)

    if not evaluator.has_data():
        return None
    h, w = cfg.dataset.dataloading_hw
    return evaluator.evaluate_buffer(img_height=h, img_width=w)
