from rvt_tpu.models.backbone import RVTBackbone, zero_states
from rvt_tpu.models.detector import RVTDetector, init_detector, scan_backbone
from rvt_tpu.models.yolox import YoloPAFPN, YoloXHead

__all__ = [
    "RVTBackbone", "RVTDetector", "YoloPAFPN", "YoloXHead",
    "init_detector", "scan_backbone", "zero_states",
]
