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
