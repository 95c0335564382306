"""SimOTA dynamic label assignment, re-expressed as static-shape batched ops.

The reference implementation (``models/detection/yolox/models/yolo_head.py``,
``get_assignments`` 452-541, ``get_geometry_constraint`` 543-572,
``simota_matching`` 574-606) runs a *per-image Python loop* with dynamic
boolean indexing and a per-GT ``torch.topk`` with data-dependent k — none of
which can compile to TPU. This module computes the identical assignment with
fixed shapes:

  * ground truths are padded to ``M`` with a validity mask,
  * the geometry/candidate filter becomes a penalty mask instead of a gather,
  * the dynamic-k top-k (k = clamp(int(sum top-10 IoU), 1) <= 10) becomes a
    static top-10 followed by a rank < k mask,
  * the "anchor matched to multiple GTs -> keep cheapest" rule becomes a
    vectorised argmin rewrite.

Equivalence to the reference loop is covered by tests/test_simota.py.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from rvt_tpu.ops.boxes import pairwise_iou_cxcywh

Array = jax.Array

_BIG = 1e15  # sentinel cost for excluded (gt, anchor) pairs
_N_CANDIDATE_K = 10  # yolo_head.py:577
_CENTER_RADIUS = 1.5  # yolo_head.py:556


class SimOTAAssignment(NamedTuple):
    fg_mask: Array        # [A] bool — anchor is a positive
    matched_gt: Array     # [A] int32 — index into the (padded) GT list
    pred_ious: Array      # [A] f32 — IoU of the matched pair (0 for bg)
    num_fg: Array         # scalar f32


def simota_assign(pred_boxes: Array, obj_logit: Array, cls_logit: Array,
                  gt_boxes: Array, gt_classes: Array, gt_mask: Array,
                  grid_xy: Array, anchor_strides: Array,
                  num_classes: int) -> SimOTAAssignment:
    """Assign GTs to anchors for one image.

    pred_boxes:    [A, 4] decoded cxcywh (input pixels)
    obj_logit:     [A]
    cls_logit:     [A, C]
    gt_boxes:      [M, 4] cxcywh, zero-padded
    gt_classes:    [M] int32
    gt_mask:       [M] bool — True for real GTs
    grid_xy:       [A, 2] anchor grid coords (cell units)
    anchor_strides:[A] stride per anchor
    """
    A = pred_boxes.shape[0]
    M = gt_boxes.shape[0]
    f32 = jnp.float32

    # ---- geometry constraint (yolo_head.py:543-572) ----
    centers = (grid_xy + 0.5) * anchor_strides[:, None]  # [A, 2]
    center_dist = anchor_strides * _CENTER_RADIUS  # [A]
    lt = gt_boxes[:, None, :2] - center_dist[None, :, None]  # [M, A, 2]
    rb = gt_boxes[:, None, :2] + center_dist[None, :, None]
    deltas = jnp.concatenate([centers[None] - lt, rb - centers[None]], axis=-1)
    is_in_center = jnp.min(deltas, axis=-1) > 0.0  # [M, A]
    is_in_center = jnp.logical_and(is_in_center, gt_mask[:, None])
    anchor_filter = jnp.any(is_in_center, axis=0)  # [A]
    pair_valid = jnp.logical_and(anchor_filter[None, :], gt_mask[:, None])

    # ---- pairwise IoU & losses (yolo_head.py:493-519) ----
    ious = pairwise_iou_cxcywh(gt_boxes.astype(f32), pred_boxes.astype(f32))
    ious = jnp.where(pair_valid, ious, 0.0)
    iou_loss = -jnp.log(ious + 1e-8)

    cls_prob = jnp.sqrt(jax.nn.sigmoid(cls_logit.astype(f32)) *
                        jax.nn.sigmoid(obj_logit.astype(f32))[:, None])  # [A, C]
    gt_onehot = jax.nn.one_hot(gt_classes, num_classes, dtype=f32)  # [M, C]
    p = jnp.clip(cls_prob, 1e-9, 1.0 - 1e-9)
    # BCE(p, y) summed over classes, broadcast over (M, A)
    bce = -(gt_onehot[:, None, :] * jnp.log(p[None]) +
            (1.0 - gt_onehot[:, None, :]) * jnp.log(1.0 - p[None]))
    cls_loss = jnp.sum(bce, axis=-1)  # [M, A]

    cost = cls_loss + 3.0 * iou_loss + 1e6 * (~is_in_center).astype(f32)
    cost = jnp.where(pair_valid, cost, _BIG)

    # ---- dynamic-k estimation (yolo_head.py:576-579) ----
    k_top = min(_N_CANDIDATE_K, A)
    topk_ious, _ = jax.lax.top_k(ious, k_top)  # [M, k]
    dynamic_ks = jnp.clip(jnp.sum(topk_ious, axis=1).astype(jnp.int32), 1, k_top)

    # ---- per-GT top-k by smallest cost (yolo_head.py:580-584) ----
    neg_cost_top, top_idx = jax.lax.top_k(-cost, k_top)  # [M, k]
    cand_ok = (-neg_cost_top) < _BIG / 2  # exclude sentinel picks
    rank = jnp.arange(k_top)[None, :]
    select = jnp.logical_and(rank < dynamic_ks[:, None], cand_ok)
    select = jnp.logical_and(select, gt_mask[:, None])
    # scatter into [M, A] matching matrix
    matching = jnp.zeros((M, A), jnp.bool_)
    matching = jax.vmap(
        lambda mrow, idx, sel: mrow.at[idx].set(sel)
    )(matching, top_idx, select)

    # ---- resolve anchors matched to multiple GTs (yolo_head.py:588-594) ----
    anchor_matching_gt = jnp.sum(matching.astype(jnp.int32), axis=0)  # [A]
    multiple = anchor_matching_gt > 1
    cost_argmin = jnp.argmin(cost, axis=0)  # [A]
    # keep_row[m, a] == (m is the cheapest GT for anchor a); the reference
    # rewrites multi-matched columns to exactly this row (yolo_head.py:592-594)
    keep_row = cost_argmin[None, :] == jnp.arange(M)[:, None]
    matching = jnp.where(multiple[None, :], keep_row, matching)

    fg_mask = jnp.any(matching, axis=0)  # [A]
    matched_gt = jnp.argmax(matching.astype(jnp.int32), axis=0).astype(jnp.int32)
    pred_ious = jnp.sum(matching.astype(f32) * ious, axis=0)
    num_fg = jnp.sum(fg_mask.astype(f32))
    return SimOTAAssignment(fg_mask=fg_mask, matched_gt=matched_gt,
                            pred_ious=pred_ious, num_fg=num_fg)
