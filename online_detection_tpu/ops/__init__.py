"""TPU kernels: Gaussian-kernel mmv (Pallas), RoIAlign, fixed-size NMS."""

from online_detection_tpu.ops.gaussian_mmv import gaussian_kernel, mmv, mmv_pallas, mmv_xla  # noqa: F401
from online_detection_tpu.ops.nms import batched_class_nms, nms, nms_mask  # noqa: F401
from online_detection_tpu.ops.roi_align import roi_align, roi_align_nchw  # noqa: F401
