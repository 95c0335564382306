from rvt_tpu.ops.boxes import (cxcywh_to_xyxy, pairwise_iou_cxcywh,
                               pairwise_iou_xyxy, postprocess, xyxy_to_cxcywh)
from rvt_tpu.ops.s2d import (device_space_to_depth, fold_stem_kernel,
                             host_space_to_depth)
from rvt_tpu.ops.simota import SimOTAAssignment, simota_assign
from rvt_tpu.ops.voxelization import (mixed_density_stack,
                                      repair_time_monotonicity,
                                      stacked_histogram,
                                      stacked_histogram_pallas,
                                      stacked_histogram_pallas_batched)

__all__ = [
    "cxcywh_to_xyxy", "xyxy_to_cxcywh", "pairwise_iou_xyxy",
    "pairwise_iou_cxcywh", "postprocess", "host_space_to_depth",
    "device_space_to_depth", "fold_stem_kernel", "SimOTAAssignment",
    "simota_assign", "mixed_density_stack", "repair_time_monotonicity",
    "stacked_histogram", "stacked_histogram_pallas",
    "stacked_histogram_pallas_batched",
]
