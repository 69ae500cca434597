from lvc_tpu.ops.nms import nms_mask, batched_nms_mask, masked_topk  # noqa: F401
from lvc_tpu.ops.roi_align import multilevel_roi_align, assign_boxes_to_levels  # noqa: F401
