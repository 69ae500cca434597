"""Box primitives as pure functions on ``(N, 4)`` arrays.

TPU-native counterpart of the reference's ``detectron2/structures/boxes.py``
(``Boxes``/``BoxMode``/``pairwise_iou``, boxes.py:12,132,315). Instead of a
tensor-wrapping class, every op is a pure function over ``(..., 4)`` XYXY
arrays so it composes with jit/vmap/shard_map. Works on both jnp and np
inputs (host-side data plumbing uses numpy through the same functions).
"""
from __future__ import annotations

import enum
from typing import Union

import jax.numpy as jnp
import numpy as np

Array = Union[jnp.ndarray, np.ndarray]


class BoxMode(enum.IntEnum):
    """Same encoding as the reference BoxMode (structures/boxes.py:12-41)."""

    XYXY_ABS = 0
    XYWH_ABS = 1
    XYXY_REL = 2
    XYWH_REL = 3
    XYWHA_ABS = 4

    @staticmethod
    def convert(box: Array, from_mode: "BoxMode", to_mode: "BoxMode") -> Array:
        """Convert between XYXY_ABS and XYWH_ABS (the modes LVC uses)."""
        if from_mode == to_mode:
            return box
        xp = jnp if isinstance(box, jnp.ndarray) else np
        box = xp.asarray(box)
        if from_mode == BoxMode.XYWH_ABS and to_mode == BoxMode.XYXY_ABS:
            x, y, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
            return xp.stack([x, y, x + w, y + h], axis=-1)
        if from_mode == BoxMode.XYXY_ABS and to_mode == BoxMode.XYWH_ABS:
            x0, y0, x1, y1 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
            return xp.stack([x0, y0, x1 - x0, y1 - y0], axis=-1)
        raise NotImplementedError(f"Conversion {from_mode} -> {to_mode} not supported")


def area(boxes: Array) -> Array:
    """Box areas; reference Boxes.area (structures/boxes.py:149)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def clip(boxes: Array, height: Array, width: Array) -> Array:
    """Clip boxes to ``[0, width] x [0, height]``; reference Boxes.clip (:158)."""
    xp = jnp if isinstance(boxes, jnp.ndarray) else np
    x0 = xp.clip(boxes[..., 0], 0, width)
    y0 = xp.clip(boxes[..., 1], 0, height)
    x1 = xp.clip(boxes[..., 2], 0, width)
    y1 = xp.clip(boxes[..., 3], 0, height)
    return xp.stack([x0, y0, x1, y1], axis=-1)


def nonempty(boxes: Array, threshold: float = 0.0) -> Array:
    """Mask of boxes with both sides > threshold; reference Boxes.nonempty (:171)."""
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    return (widths > threshold) & (heights > threshold)


def pairwise_intersection(boxes1: Array, boxes2: Array) -> Array:
    """(N, M) intersection areas between two box sets (XYXY)."""
    xp = jnp if isinstance(boxes1, jnp.ndarray) or isinstance(boxes2, jnp.ndarray) else np
    lt = xp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = xp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = xp.clip(rb - lt, 0, None)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: Array, boxes2: Array) -> Array:
    """(N, M) IoU matrix; matches reference pairwise_iou (structures/boxes.py:315):
    returns 0 where intersection is 0 (covers empty/degenerate boxes)."""
    xp = jnp if isinstance(boxes1, jnp.ndarray) or isinstance(boxes2, jnp.ndarray) else np
    area1 = area(boxes1)
    area2 = area(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = xp.where(inter > 0, inter / xp.where(union > 0, union, 1.0), 0.0)
    return iou


def pairwise_ioa(boxes1: Array, boxes2: Array) -> Array:
    """(N, M) intersection-over-area-of-boxes2; reference pairwise_ioa (:341).

    Used by the ignore-overlap filter (lvc/data/utils.py:27)."""
    xp = jnp if isinstance(boxes1, jnp.ndarray) or isinstance(boxes2, jnp.ndarray) else np
    area2 = area(boxes2)
    inter = pairwise_intersection(boxes1, boxes2)
    return xp.where(inter > 0, inter / xp.where(area2 > 0, area2, 1.0)[..., None, :], 0.0)


def matched_pairwise_iou(boxes1: Array, boxes2: Array) -> Array:
    """Elementwise IoU of aligned box lists (N,) (reference matched_boxlist_iou)."""
    xp = jnp if isinstance(boxes1, jnp.ndarray) or isinstance(boxes2, jnp.ndarray) else np
    area1 = area(boxes1)
    area2 = area(boxes2)
    lt = xp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = xp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = xp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return xp.where(inter > 0, inter / xp.where(union > 0, union, 1.0), 0.0)


def pairwise_giou(boxes1: Array, boxes2: Array) -> Array:
    """Elementwise generalized IoU of aligned box lists (N,).

    Matches the reference's giou loss math (fvcore giou_loss semantics used by
    lvc/modeling/roi_heads/fast_rcnn.py:296-359 and the UBBR loss in
    roi_heads_cascade.py:140-195)."""
    xp = jnp if isinstance(boxes1, jnp.ndarray) or isinstance(boxes2, jnp.ndarray) else np
    area1 = area(boxes1)
    area2 = area(boxes2)
    lt = xp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = xp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = xp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / xp.where(union > 0, union, 1.0)
    # smallest enclosing box
    lt_c = xp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_c = xp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_c = xp.clip(rb_c - lt_c, 0, None)
    area_c = wh_c[..., 0] * wh_c[..., 1]
    return iou - (area_c - union) / xp.where(area_c > 0, area_c, 1.0)
