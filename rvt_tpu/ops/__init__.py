from rvt_tpu.ops.boxes import (cxcywh_to_xyxy, pairwise_iou_cxcywh,
                               pairwise_iou_xyxy, postprocess, xyxy_to_cxcywh)

__all__ = [
    "cxcywh_to_xyxy", "xyxy_to_cxcywh", "pairwise_iou_xyxy",
    "pairwise_iou_cxcywh", "postprocess",
]
