"""YOLOX detection loss with SimOTA assignment — batched, static shapes.

Mirrors ``yolo_head.py:get_losses`` (291-443):
  loss = 5 * IoU(1 - iou^2, fg only) + BCE(obj, all anchors) + BCE(cls, fg)
all normalised by the total number of foreground anchors across the batch
(min 1). The reference's per-image Python loop and its CUDA-OOM CPU
fallback become a single ``vmap`` over frames; padded frames and padded
GTs are excluded via masks.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from rvt_tpu.ops.simota import simota_assign

Array = jax.Array


def iou_cxcywh(pred: Array, target: Array) -> Array:
    """Elementwise IoU between [N,4] cxcywh boxes (losses.py:15-33)."""
    tl = jnp.maximum(pred[:, :2] - pred[:, 2:] / 2, target[:, :2] - target[:, 2:] / 2)
    br = jnp.minimum(pred[:, :2] + pred[:, 2:] / 2, target[:, :2] + target[:, 2:] / 2)
    area_p = jnp.prod(pred[:, 2:], axis=1)
    area_g = jnp.prod(target[:, 2:], axis=1)
    en = jnp.all(tl < br, axis=1).astype(pred.dtype)
    area_i = jnp.prod(br - tl, axis=1) * en
    area_u = area_p + area_g - area_i
    return area_i / (area_u + 1e-16)


def _bce_with_logits(logits: Array, targets: Array) -> Array:
    """Numerically stable BCE-with-logits (== torch BCEWithLogitsLoss)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def yolox_loss(preds: Array, gt_labels: Array, gt_mask: Array,
               frame_valid: Array, grid_xy: Array, anchor_strides: Array,
               num_classes: int) -> Dict[str, Array]:
    """Compute the detection loss over a batch of frames.

    preds:        [B, A, 5+C] — decoded cxcywh boxes + obj/cls logits
    gt_labels:    [B, M, 5] — (class_id, cx, cy, w, h), zero padded
    gt_mask:      [B, M] bool
    frame_valid:  [B] bool — False for gathered padding frames
    grid_xy:      [A, 2]; anchor_strides: [A]
    """
    f32 = jnp.float32
    preds = preds.astype(f32)
    boxes = preds[..., :4]
    obj_logit = preds[..., 4]
    cls_logit = preds[..., 5:]
    gt_boxes = gt_labels[..., 1:5].astype(f32)
    gt_classes = gt_labels[..., 0].astype(jnp.int32)
    gt_mask = jnp.logical_and(gt_mask, frame_valid[:, None])

    assign = jax.vmap(
        lambda b, o, c, gb, gc, gm: simota_assign(
            b, o, c, gb, gc, gm, grid_xy, anchor_strides, num_classes)
    )(boxes, obj_logit, cls_logit, gt_boxes, gt_classes, gt_mask)

    fg = jnp.logical_and(assign.fg_mask, frame_valid[:, None])  # [B, A]
    fg_f = fg.astype(f32)
    num_fg = jnp.maximum(jnp.sum(fg_f), 1.0)
    num_gts = jnp.maximum(jnp.sum(gt_mask.astype(f32)), 1.0)

    # --- IoU loss (fg only): 1 - iou^2 (losses.py:36) ---
    matched_boxes = jnp.take_along_axis(
        gt_boxes, assign.matched_gt[..., None], axis=1)  # [B, A, 4]
    iou = jax.vmap(iou_cxcywh)(boxes, matched_boxes)  # [B, A]
    loss_iou = jnp.sum((1.0 - iou ** 2) * fg_f) / num_fg

    # --- objectness BCE over all (valid-frame) anchors ---
    obj_target = fg_f
    obj_bce = _bce_with_logits(obj_logit, obj_target)
    loss_obj = jnp.sum(obj_bce * frame_valid[:, None].astype(f32)) / num_fg

    # --- classification BCE (fg only), target = onehot * matched IoU ---
    matched_cls = jnp.take_along_axis(gt_classes, assign.matched_gt, axis=1)  # [B, A]
    cls_target = (jax.nn.one_hot(matched_cls, num_classes, dtype=f32) *
                  assign.pred_ious[..., None])
    cls_bce = _bce_with_logits(cls_logit, cls_target)
    loss_cls = jnp.sum(jnp.sum(cls_bce, axis=-1) * fg_f) / num_fg

    reg_weight = 5.0
    loss = reg_weight * loss_iou + loss_obj + loss_cls
    return {
        "loss": loss,
        "iou_loss": reg_weight * loss_iou,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "num_fg": jnp.sum(fg_f) / num_gts,
    }
