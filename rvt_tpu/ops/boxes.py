"""Box utilities + fully on-device, static-shape NMS postprocess.

Replaces the reference's host round-trip through torchvision's C++/CUDA
``batched_nms`` (``models/detection/yolox/utils/boxes.py:32-76``) with a
TPU-resident implementation:

  * the confidence filter, top-k pre-selection, class-aware greedy NMS and
    final top-k all run inside the same jit region as the model,
  * every shape is static: the output is a padded ``[max_detections, 7]``
    tensor + validity mask instead of a variable-length list,
  * semantics match torchvision: boxes are processed in descending score
    order and suppressed when IoU with an already-kept, same-class box
    *exceeds* the threshold (strictly greater).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def cxcywh_to_xyxy(boxes: Array) -> Array:
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_cxcywh(boxes: Array) -> Array:
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def pairwise_iou_xyxy(a: Array, b: Array) -> Array:
    """IoU matrix [N, M] for xyxy boxes (== torchvision box_iou)."""
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.where(union > 0, union, 1.0)


def pairwise_iou_cxcywh(a: Array, b: Array) -> Array:
    """IoU matrix for cxcywh boxes (mirrors bboxes_iou(xyxy=False),
    ``models/detection/yolox/utils/boxes.py:79-102``)."""
    tl = jnp.maximum(a[:, None, :2] - a[:, None, 2:] / 2, b[None, :, :2] - b[None, :, 2:] / 2)
    br = jnp.minimum(a[:, None, :2] + a[:, None, 2:] / 2, b[None, :, :2] + b[None, :, 2:] / 2)
    en = jnp.all(tl < br, axis=-1).astype(a.dtype)
    inter = jnp.prod(br - tl, axis=-1) * en
    area_a = jnp.prod(a[:, 2:], axis=-1)
    area_b = jnp.prod(b[:, 2:], axis=-1)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.where(union != 0, union, 1.0)


def _greedy_nms_mask(boxes: Array, scores: Array, valid: Array,
                     iou_threshold: float) -> Array:
    """Greedy NMS over boxes sorted by descending score.

    boxes: [K, 4] xyxy (already class-offset for class-aware NMS), sorted.
    Returns keep mask [K] — identical result to torchvision's greedy loop.

    Greedy keep is the unique fixpoint of
        keep[i] = valid[i] and not any(j < i: M[j, i] and keep[j])
    (unique because the suppression relation j < i is acyclic). A K-step
    sequential scan computes it in K latency-bound iterations; instead we
    Jacobi-iterate the whole vector — after n rounds every box whose
    suppression-chain depth is <= n is final, and real scenes have chain
    depths of a few, so the ``while_loop`` exits after ~3-8 matrix-mask
    rounds instead of 512 scalar rounds (~8x faster NMS on v5e).
    """
    K = boxes.shape[0]
    iou = pairwise_iou_xyxy(boxes, boxes)
    earlier = jnp.arange(K)[:, None] < jnp.arange(K)[None, :]
    M = (iou > iou_threshold) & earlier  # M[j, i]: kept j suppresses i

    def f(k: Array) -> Array:
        return valid & ~jnp.any(M & k[:, None], axis=0)

    def cond(state):
        k, prev, it = state
        return jnp.any(k != prev) & (it < K)

    def body(state):
        k, _, it = state
        return f(k), k, it + 1

    k0 = valid
    keep, _, _ = jax.lax.while_loop(cond, body, (f(k0), k0, jnp.int32(0)))
    return keep


@partial(jax.jit, static_argnames=("num_classes", "conf_thre", "nms_thre",
                                   "pre_nms_topk", "max_detections",
                                   "class_agnostic"))
def postprocess(prediction: Array, num_classes: int, conf_thre: float = 0.7,
                nms_thre: float = 0.45, pre_nms_topk: int = 1000,
                max_detections: int = 300, class_agnostic: bool = False,
                ) -> Tuple[Array, Array]:
    """Batched confidence filter + class-aware NMS, all on device.

    prediction: [B, A, 5+C] — decoded cxcywh boxes, obj prob, class probs
    (i.e. the inference output of the head after sigmoid).

    ``pre_nms_topk <= 0`` (the default config) means *all* anchors enter
    NMS — exactly the reference semantics, which NMS-es every box above
    the confidence threshold (``boxes.py:56-68``). A positive value is an
    opt-in speed knob: only the top-k boxes by score are considered, which
    is exact whenever fewer than k boxes pass the confidence threshold
    and may clip true positives in dense scenes otherwise.

    The exact default still serves fast: a batch-level ``lax.cond``
    dispatches to a top-512 candidate set whenever NO lane has more than
    512 above-threshold boxes (the typical trained-detector case). That
    branch is bitwise-identical to the all-anchor result — boxes that are
    never kept can never suppress — while the overflow branch (dense
    scenes) pays for the full [A, A] IoU matrix only when it must.

    Returns (detections [B, max_detections, 7], valid [B, max_detections]):
    detections ordered (x1, y1, x2, y2, obj_conf, class_conf, class_id) —
    the same layout as the reference postprocess (boxes.py:50-51).
    """
    def per_image(pred: Array, k: int) -> Tuple[Array, Array]:
        boxes = cxcywh_to_xyxy(pred[:, :4])
        obj = pred[:, 4]
        cls_probs = pred[:, 5:5 + num_classes]
        class_conf = jnp.max(cls_probs, axis=-1)
        class_id = jnp.argmax(cls_probs, axis=-1).astype(jnp.float32)
        score = obj * class_conf
        valid = score >= conf_thre

        top_score, top_idx = jax.lax.top_k(jnp.where(valid, score, -jnp.inf), k)
        top_valid = jnp.isfinite(top_score)
        top_boxes = boxes[top_idx]
        top_cls = class_id[top_idx]

        if class_agnostic:
            nms_boxes = top_boxes
        else:
            # torchvision batched_nms trick: offset boxes per class so
            # different classes never suppress each other.
            max_coord = jnp.max(jnp.where(top_valid[:, None], top_boxes, 0.0))
            offset = top_cls * (max_coord + 1.0)
            nms_boxes = top_boxes + offset[:, None]

        keep = _greedy_nms_mask(nms_boxes, top_score, top_valid, nms_thre)

        kept_score = jnp.where(keep, top_score, -jnp.inf)
        m = min(max_detections, k)
        fin_score, fin_idx = jax.lax.top_k(kept_score, m)
        fin_valid = jnp.isfinite(fin_score)
        det = jnp.concatenate([
            top_boxes[fin_idx],
            obj[top_idx][fin_idx][:, None],
            class_conf[top_idx][fin_idx][:, None],
            top_cls[fin_idx][:, None],
        ], axis=-1)
        det = jnp.where(fin_valid[:, None], det, 0.0)
        if m < max_detections:
            det = jnp.pad(det, ((0, max_detections - m), (0, 0)))
            fin_valid = jnp.pad(fin_valid, (0, max_detections - m))
        return det, fin_valid

    A = prediction.shape[1]
    if pre_nms_topk > 0:
        return jax.vmap(partial(per_image, k=min(pre_nms_topk, A)))(
            prediction)

    fast_k = min(512, A)
    if fast_k == A:
        return jax.vmap(partial(per_image, k=A))(prediction)
    obj = prediction[..., 4]
    class_conf = jnp.max(prediction[..., 5:5 + num_classes], axis=-1)
    n_valid_max = jnp.max(jnp.sum(obj * class_conf >= conf_thre, axis=-1))
    return jax.lax.cond(
        n_valid_max > fast_k,
        lambda p: jax.vmap(partial(per_image, k=A))(p),
        lambda p: jax.vmap(partial(per_image, k=fast_k))(p),
        prediction)
