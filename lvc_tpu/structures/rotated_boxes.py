"""Rotated-box primitives as pure functions on ``(..., 5)`` XYWHA arrays.

TPU-native counterpart of the reference's ``detectron2/structures/rotated_boxes.py``
(481 LoC) plus the native polygon-clip IoU kernel
``detectron2/layers/csrc/box_iou_rotated/box_iou_rotated_utils.h`` (363 LoC of
templated C++). A box is ``(cx, cy, w, h, angle)`` with the angle in degrees
measured counter-clockwise in image coordinates (d2 convention,
rotated_boxes.py:133-166).

Instead of a per-pair scalar polygon clip in registers, the intersection area
is computed fully vectorized over the (N, M) pair grid with fixed shapes:
24 candidate vertices per pair (16 edge-edge intersections + 2x4 contained
corners), masked, angularly sorted, shoelace — pure VPU work that XLA maps
onto the (8, 128) vector unit with no data-dependent control flow.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def area_rotated(boxes: Array) -> Array:
    """Areas of XYWHA boxes; reference RotatedBoxes.area (rotated_boxes.py:235)."""
    return boxes[..., 2] * boxes[..., 3]


def normalize_angles(boxes: Array, angle_bound: float = 180.0) -> Array:
    """Map angles into ``[-angle_bound, angle_bound)`` (reference
    RotatedBoxes.normalize_angles, rotated_boxes.py:243-246)."""
    xp = jnp if isinstance(boxes, jnp.ndarray) else np
    a = (boxes[..., 4] + angle_bound) % (2.0 * angle_bound) - angle_bound
    return xp.concatenate([boxes[..., :4], a[..., None]], axis=-1)


def clip_rotated(
    boxes: Array, height: Array, width: Array, clip_angle_threshold: float = 1.0
) -> Array:
    """Clip *near-horizontal* boxes to the image; leave rotated ones alone
    (reference RotatedBoxes.clip semantics, rotated_boxes.py:248-294: only
    boxes with |angle| <= threshold are clipped, via their XYXY form)."""
    xp = jnp if isinstance(boxes, jnp.ndarray) else np
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    x0 = xp.clip(cx - w / 2.0, 0, width)
    y0 = xp.clip(cy - h / 2.0, 0, height)
    x1 = xp.clip(cx + w / 2.0, 0, width)
    y1 = xp.clip(cy + h / 2.0, 0, height)
    near_horizontal = xp.abs(a) <= clip_angle_threshold
    new = xp.stack([(x0 + x1) / 2.0, (y0 + y1) / 2.0, x1 - x0, y1 - y0, a], axis=-1)
    return xp.where(near_horizontal[..., None], new, boxes)


def nonempty_rotated(boxes: Array, threshold: float = 0.0) -> Array:
    """Mask of boxes with both sides > threshold (rotated_boxes.py:296-309)."""
    return (boxes[..., 2] > threshold) & (boxes[..., 3] > threshold)


def corners(boxes: Array) -> Array:
    """Corner points (..., 4, 2) of XYWHA boxes.

    CCW angle in image coordinates (y down): the corner offsets rotate by
    R(-theta) in math convention, matching the reference's corner math in
    box_iou_rotated_utils.h:120-140.
    """
    xp = jnp if isinstance(boxes, jnp.ndarray) else np
    theta = boxes[..., 4] * (np.pi / 180.0)
    c = xp.cos(theta)
    s = xp.sin(theta)
    w2 = boxes[..., 2] / 2.0
    h2 = boxes[..., 3] / 2.0
    # offsets in box frame: (+-w/2, +-h/2), CCW ring order
    dx = xp.stack([-w2, w2, w2, -w2], axis=-1)
    dy = xp.stack([-h2, -h2, h2, h2], axis=-1)
    x = boxes[..., 0:1] + dx * c[..., None] + dy * s[..., None]
    y = boxes[..., 1:2] - dx * s[..., None] + dy * c[..., None]
    return xp.stack([x, y], axis=-1)


def _cross(o, a, b):
    return (a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1]) - (
        a[..., 1] - o[..., 1]
    ) * (b[..., 0] - o[..., 0])


def _points_in_quad(pts: Array, quad: Array) -> Array:
    """pts (..., P, 2) inside convex quad (..., 4, 2) (ring order), inclusive."""
    # Signed cross product of each quad edge vs the point; inside iff all
    # crosses share the ring's orientation sign (or are zero).
    q0 = quad[..., None, :, :]  # (..., 1, 4, 2)
    q1 = jnp.roll(quad, -1, axis=-2)[..., None, :, :]
    p = pts[..., :, None, :]  # (..., P, 1, 2)
    cr = _cross(q0, q1, p)  # (..., P, 4)
    return jnp.all(cr >= -1e-9, axis=-1) | jnp.all(cr <= 1e-9, axis=-1)


def _segment_intersections(quad1: Array, quad2: Array) -> tuple[Array, Array]:
    """All 16 edge-edge intersection points between two quads.

    Returns points (..., 16, 2) and validity (..., 16). Parallel or
    non-crossing segment pairs are masked out.
    """
    p0 = quad1[..., :, None, :]  # (..., 4, 1, 2)
    p1 = jnp.roll(quad1, -1, axis=-2)[..., :, None, :]
    q0 = quad2[..., None, :, :]  # (..., 1, 4, 2)
    q1 = jnp.roll(quad2, -1, axis=-2)[..., None, :, :]
    d1 = p1 - p0
    d2 = q1 - q0
    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]  # (..., 4, 4)
    safe = jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
    diff = q0 - p0
    t = (diff[..., 0] * d2[..., 1] - diff[..., 1] * d2[..., 0]) / safe
    u = (diff[..., 0] * d1[..., 1] - diff[..., 1] * d1[..., 0]) / safe
    hit = (jnp.abs(denom) > 1e-12) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pt = p0 + t[..., None] * d1
    shape = pt.shape[:-3] + (16, 2)
    return pt.reshape(shape), hit.reshape(hit.shape[:-2] + (16,))


def _convex_polygon_area(pts: Array, valid: Array) -> Array:
    """Area of the convex polygon formed by masked candidate vertices.

    All valid points lie on the boundary of a convex region. Invalid slots
    are replaced by the angular "anchor" vertex so that after the angular
    sort they cluster as zero-area duplicates.
    """
    big = 1e9
    num = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1)
    centroid = jnp.sum(jnp.where(valid[..., None], pts, 0.0), axis=-2, keepdims=True) / num[..., None]
    ang = jnp.arctan2(pts[..., 1] - centroid[..., 1], pts[..., 0] - centroid[..., 0])
    ang = jnp.where(valid, ang, big)
    order = jnp.argsort(ang, axis=-1)
    # anchor = valid point with the smallest angle (first in sort order)
    anchor = jnp.take_along_axis(pts, order[..., :1, None].repeat(2, axis=-1), axis=-2)
    pts_filled = jnp.where(valid[..., None], pts, anchor)
    ang = jnp.where(valid, ang, -big)  # duplicates of the anchor sort first, adjacent
    order = jnp.argsort(ang, axis=-1, stable=True)
    ring = jnp.take_along_axis(pts_filled, order[..., None].repeat(2, axis=-1), axis=-2)
    nxt = jnp.roll(ring, -1, axis=-2)
    area2 = jnp.sum(ring[..., 0] * nxt[..., 1] - nxt[..., 0] * ring[..., 1], axis=-1)
    return jnp.abs(area2) / 2.0


def pairwise_intersection_rotated(boxes1: Array, boxes2: Array) -> Array:
    """(N, M) intersection areas between two XYWHA box sets.

    Vectorized equivalent of the reference's per-pair
    ``rotated_boxes_intersection`` (box_iou_rotated_utils.h:257-306).
    """
    q1 = corners(boxes1)[..., :, None, :, :]  # (N, 1, 4, 2)
    q2 = corners(boxes2)[..., None, :, :, :]  # (1, M, 4, 2)
    n, m = boxes1.shape[-2], boxes2.shape[-2]
    q1 = jnp.broadcast_to(q1, q1.shape[:-4] + (n, m, 4, 2))
    q2 = jnp.broadcast_to(q2, q2.shape[:-4] + (n, m, 4, 2))
    ipts, ivalid = _segment_intersections(q1, q2)
    in12 = _points_in_quad(q1, q2)  # corners of 1 inside 2
    in21 = _points_in_quad(q2, q1)
    pts = jnp.concatenate([ipts, q1, q2], axis=-2)  # (N, M, 24, 2)
    valid = jnp.concatenate([ivalid, in12, in21], axis=-1)
    area = _convex_polygon_area(pts, valid)
    return jnp.where(jnp.sum(valid, axis=-1) >= 3, area, 0.0)


def pairwise_iou_rotated(boxes1: Array, boxes2: Array) -> Array:
    """(N, M) IoU between XYWHA box sets; reference ``pairwise_iou_rotated``
    (structures/rotated_boxes.py:459-481 → csrc/box_iou_rotated)."""
    a1 = area_rotated(boxes1)
    a2 = area_rotated(boxes2)
    inter = pairwise_intersection_rotated(boxes1, boxes2)
    union = a1[..., :, None] + a2[..., None, :] - inter
    return jnp.where(inter > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)
