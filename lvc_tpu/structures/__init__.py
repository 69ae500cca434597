from lvc_tpu.structures.boxes import (  # noqa: F401
    BoxMode,
    area,
    clip,
    nonempty,
    pairwise_iou,
    pairwise_ioa,
    pairwise_giou,
    matched_pairwise_iou,
)
from lvc_tpu.structures.image_list import ImageList  # noqa: F401
from lvc_tpu.structures.rotated_boxes import (  # noqa: F401
    area_rotated,
    clip_rotated,
    nonempty_rotated,
    normalize_angles,
    pairwise_intersection_rotated,
    pairwise_iou_rotated,
)
