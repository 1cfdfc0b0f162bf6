"""Model layer: backbone, anchors, RPN, ROI heads, assembled detector."""

from online_detection_tpu.models.detector import (  # noqa: F401
    DetectorConfig, OnlineModelSet, detect, detect_pretrained,
    init_detector_params,
)
from online_detection_tpu.models.heads import (  # noqa: F401
    OnlineDetectorModels, OnlineMaskModels,
)
from online_detection_tpu.models.rpn import OnlineRPNModels  # noqa: F401
from online_detection_tpu.models.weights import load_checkpoint  # noqa: F401
