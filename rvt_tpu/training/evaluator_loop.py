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


def run_streaming_eval(model: RVTDetector, variables, cfg: ExperimentConfig,
                       batches: Iterable[Batch],
                       batch_size: int) -> Optional[Dict[str, float]]:
    """Evaluate over an iterable of stream batches (all same batch size).

    Returns the Prophesee COCO metrics dict or None if no labels were seen.
    """
    eval_step = make_eval_step(model, cfg)
    evaluator = PropheseeEvaluator(cfg.dataset.name,
                                   cfg.dataset.downsample_by_factor_2)
    states = zero_states(cfg.model.backbone, batch_size)
    stem_s2d = model.cfg.backbone.stem_s2d
    if stem_s2d:
        from rvt_tpu.ops.s2d import host_space_to_depth

    def consume(batch: Batch, outputs) -> None:
        """Convert one window's device outputs to protocol arrays (host)."""
        dets, det_valid, frame_idx, gval = [np.asarray(o) for o in outputs]
        gt_list, pred_list = [], []
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
                gt_list.append(labels_to_structured(labels))
                pred_list.append(detections_to_structured(
                    dets[b, k], det_valid[b, k], time_us))
        if gt_list:
            evaluator.add_labels(gt_list)
            evaluator.add_predictions(pred_list)

    # one-window lag: host-side conversion of window N overlaps the device
    # computing window N+1 (dispatch is async; fetches happen in consume)
    pending = None
    for batch in batches:
        assert batch.batch_size == batch_size
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

    if not evaluator.has_data():
        return None
    h, w = cfg.dataset.dataloading_hw
    return evaluator.evaluate_buffer(img_height=h, img_width=w)
