"""R-CNN box-to-box transform as pure functions.

Matches the math of the reference's ``Box2BoxTransform``
(detectron2/modeling/box_regression.py:16-112) exactly at fp32, including
the ``log(1000/16)`` scale clamp on dw/dh in ``apply_deltas``.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

# Clamp such that dw/dh never scale a 16px box past 1000px
# (box_regression.py:9).
SCALE_CLAMP = math.log(1000.0 / 16)


class Box2BoxTransform:
    """Parameterizes box regression by (dx, dy, dw, dh) deltas."""

    def __init__(self, weights: Sequence[float], scale_clamp: float = SCALE_CLAMP):
        self.weights = tuple(float(w) for w in weights)
        self.scale_clamp = float(scale_clamp)

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        """Deltas transforming ``src_boxes`` into ``target_boxes``.

        ``src_boxes``/``target_boxes``: (..., 4) XYXY. Returns (..., 4).
        Degenerate src boxes (w/h <= 0) produce non-finite values in the
        reference too; callers must mask them (we do so in losses).
        """
        src_w = src_boxes[..., 2] - src_boxes[..., 0]
        src_h = src_boxes[..., 3] - src_boxes[..., 1]
        src_cx = src_boxes[..., 0] + 0.5 * src_w
        src_cy = src_boxes[..., 1] + 0.5 * src_h

        tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
        tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
        tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
        tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

        wx, wy, ww, wh = self.weights
        # Guard divisions/logs so masked-out padding rows stay finite under jit
        # (the reference asserts src_widths > 0 instead; we must not, since
        # padded rows are zeros).
        safe_w = jnp.where(src_w > 0, src_w, 1.0)
        safe_h = jnp.where(src_h > 0, src_h, 1.0)
        dx = wx * (tgt_cx - src_cx) / safe_w
        dy = wy * (tgt_cy - src_cy) / safe_h
        dw = ww * jnp.log(jnp.where(tgt_w > 0, tgt_w, 1.0) / safe_w)
        dh = wh * jnp.log(jnp.where(tgt_h > 0, tgt_h, 1.0) / safe_h)
        return jnp.stack([dx, dy, dw, dh], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """Apply (..., K*4) deltas to (..., 4) boxes -> (..., K*4) boxes.

        Mirrors box_regression.py:75-112 including the exp clamp.
        """
        boxes = boxes.astype(deltas.dtype)
        widths = boxes[..., 2] - boxes[..., 0]
        heights = boxes[..., 3] - boxes[..., 1]
        ctr_x = boxes[..., 0] + 0.5 * widths
        ctr_y = boxes[..., 1] + 0.5 * heights

        wx, wy, ww, wh = self.weights
        d = deltas.reshape(deltas.shape[:-1] + (-1, 4))
        dx = d[..., 0] / wx
        dy = d[..., 1] / wy
        dw = jnp.minimum(d[..., 2] / ww, self.scale_clamp)
        dh = jnp.minimum(d[..., 3] / wh, self.scale_clamp)

        pred_cx = dx * widths[..., None] + ctr_x[..., None]
        pred_cy = dy * heights[..., None] + ctr_y[..., None]
        pred_w = jnp.exp(dw) * widths[..., None]
        pred_h = jnp.exp(dh) * heights[..., None]

        out = jnp.stack(
            [
                pred_cx - 0.5 * pred_w,
                pred_cy - 0.5 * pred_h,
                pred_cx + 0.5 * pred_w,
                pred_cy + 0.5 * pred_h,
            ],
            axis=-1,
        )
        return out.reshape(deltas.shape)


class Box2BoxTransformRotated:
    """Rotated-box regression by (dx, dy, dw, dh, da) deltas.

    Counterpart of the reference's ``Box2BoxTransformRotated``
    (detectron2/modeling/box_regression.py:114-221): dx/dy are axis-aligned
    center offsets normalized by the source w/h (not box-frame offsets), and
    da is the angle difference normalized to (-180, 180] degrees, regressed
    in radians.
    """

    def __init__(self, weights: Sequence[float], scale_clamp: float = SCALE_CLAMP):
        assert len(weights) == 5
        self.weights = tuple(float(w) for w in weights)
        self.scale_clamp = float(scale_clamp)

    def get_deltas(self, src_boxes: jnp.ndarray, target_boxes: jnp.ndarray) -> jnp.ndarray:
        """(..., 5) XYWHA src/target -> (..., 5) deltas."""
        wx, wy, ww, wh, wa = self.weights
        src_w = src_boxes[..., 2]
        src_h = src_boxes[..., 3]
        safe_w = jnp.where(src_w > 0, src_w, 1.0)
        safe_h = jnp.where(src_h > 0, src_h, 1.0)
        dx = wx * (target_boxes[..., 0] - src_boxes[..., 0]) / safe_w
        dy = wy * (target_boxes[..., 1] - src_boxes[..., 1]) / safe_h
        dw = ww * jnp.log(jnp.where(target_boxes[..., 2] > 0, target_boxes[..., 2], 1.0) / safe_w)
        dh = wh * jnp.log(jnp.where(target_boxes[..., 3] > 0, target_boxes[..., 3], 1.0) / safe_h)
        da = target_boxes[..., 4] - src_boxes[..., 4]
        da = (da + 180.0) % 360.0 - 180.0  # normalize to (-180, 180]
        da = da * (math.pi / 180.0) * wa
        return jnp.stack([dx, dy, dw, dh, da], axis=-1)

    def apply_deltas(self, deltas: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """Apply (..., 5) deltas to (..., 5) XYWHA boxes (one box per delta,
        matching the reference's rotated apply_deltas :184-221)."""
        boxes = boxes.astype(deltas.dtype)
        wx, wy, ww, wh, wa = self.weights
        dx = deltas[..., 0] / wx
        dy = deltas[..., 1] / wy
        dw = jnp.minimum(deltas[..., 2] / ww, self.scale_clamp)
        dh = jnp.minimum(deltas[..., 3] / wh, self.scale_clamp)
        da = deltas[..., 4] / wa * (180.0 / math.pi)

        pred_cx = dx * boxes[..., 2] + boxes[..., 0]
        pred_cy = dy * boxes[..., 3] + boxes[..., 1]
        pred_w = jnp.exp(dw) * boxes[..., 2]
        pred_h = jnp.exp(dh) * boxes[..., 3]
        pred_a = boxes[..., 4] + da
        pred_a = (pred_a + 180.0) % 360.0 - 180.0
        return jnp.stack([pred_cx, pred_cy, pred_w, pred_h, pred_a], axis=-1)
