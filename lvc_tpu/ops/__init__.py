from lvc_tpu.ops.nms import nms_mask, batched_nms_mask, masked_topk  # noqa: F401
from lvc_tpu.ops.roi_align import (  # noqa: F401
    assign_boxes_to_levels,
    batched_multilevel_roi_align,
    multilevel_roi_align,
)
from lvc_tpu.ops.nms import (  # noqa: F401
    batched_nms_rotated_mask,
    nms_rotated_mask,
)
from lvc_tpu.ops.roi_align import roi_align_rotated  # noqa: F401
