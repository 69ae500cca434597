"""Mask R-CNN mask head (flax, fixed-shape).

Behavioral counterpart of detectron2/modeling/roi_heads/mask_head.py
(MaskRCNNConvUpsampleHead, mask_rcnn_loss, mask_rcnn_inference). The LVC
pipeline itself never trains masks, but the head is part of the vendored
surface. TPU-first: per-roi gt mask targets are produced by RoIAlign-style
bilinear crop of the (padded) bitmask tensor — a fixed-shape gather —
instead of polygon rasterization inside the hot loop; losses are masked
means over padded slots.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from lvc_tpu.modeling.sampling import global_ratio
import flax.linen as nn


class MaskRCNNConvUpsampleHead(nn.Module):
    """N convs -> 2x deconv -> 1x1 predictor; class-specific mask logits."""

    num_classes: int = 80
    num_conv: int = 4
    conv_dim: int = 256
    cls_agnostic_mask: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, P, P, C) pooled roi features -> (N, 2P, 2P, K) logits."""
        init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
        for i in range(self.num_conv):
            x = nn.Conv(self.conv_dim, (3, 3), kernel_init=init, name=f"mask_fcn{i + 1}")(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.conv_dim, (2, 2), strides=(2, 2), kernel_init=init, name="deconv"
        )(x)
        x = nn.relu(x)
        k = 1 if self.cls_agnostic_mask else self.num_classes
        return nn.Conv(
            k, (1, 1), kernel_init=nn.initializers.normal(0.001), name="predictor"
        )(x)


def crop_gt_masks(
    gt_masks: jnp.ndarray,  # (G, Hm, Wm) bool/float bitmasks in image coords
    mask_hw: Tuple[int, int],  # bitmask tensor's (height, width) scale
    boxes: jnp.ndarray,  # (S, 4) XYXY image coords of the sampled proposals
    matched_gt_idx: jnp.ndarray,  # (S,) index of the matched gt per proposal
    out_size: int,
) -> jnp.ndarray:
    """Bilinear-crop each proposal's matched gt bitmask to (S, M, M).

    Equivalent to BitMasks.crop_and_resize (structures/masks.py) but as one
    vectorized gather instead of a torchvision roi_align call.
    """
    S = boxes.shape[0]
    M = out_size
    h, w = mask_hw
    masks = gt_masks[matched_gt_idx].astype(jnp.float32)  # (S, Hm, Wm)

    # sample grid centers inside each box (half-pixel convention)
    t = (jnp.arange(M, dtype=jnp.float32) + 0.5) / M
    x = boxes[:, 0:1] + t[None, :] * (boxes[:, 2:3] - boxes[:, 0:1])  # (S, M)
    y = boxes[:, 1:2] + t[None, :] * (boxes[:, 3:4] - boxes[:, 1:2])
    x = jnp.clip(x - 0.5, 0.0, w - 1.0)
    y = jnp.clip(y - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = x - x0
    fy = y - y0

    def per_roi(m, yy0, yy1, ffy, xx0, xx1, ffx):
        top = m[yy0][:, xx0] * (1 - ffx)[None, :] + m[yy0][:, xx1] * ffx[None, :]
        bot = m[yy1][:, xx0] * (1 - ffx)[None, :] + m[yy1][:, xx1] * ffx[None, :]
        return top * (1 - ffy)[:, None] + bot * ffy[:, None]

    return jax.vmap(per_roi)(masks, y0, y1, fy, x0, x1, fx)  # (S, M, M)


def mask_rcnn_loss(
    mask_logits: jnp.ndarray,  # (S, M, M, K)
    gt_mask_crops: jnp.ndarray,  # (S, M, M) in [0, 1]
    gt_classes: jnp.ndarray,  # (S,)
    fg: jnp.ndarray,  # (S,) foreground-slot mask
) -> jnp.ndarray:
    """Per-pixel BCE on the gt class's mask channel, mean over fg pixels."""
    k = mask_logits.shape[-1]
    if k == 1:
        logits = mask_logits[..., 0]
    else:
        cls = jnp.clip(gt_classes, 0, k - 1)
        logits = jnp.take_along_axis(
            mask_logits, cls[:, None, None, None], axis=-1
        )[..., 0]
    target = (gt_mask_crops > 0.5).astype(logits.dtype)
    bce = jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    per_roi = bce.mean(axis=(1, 2))
    return global_ratio(jnp.sum(jnp.where(fg, per_roi, 0.0)), jnp.sum(fg))


def mask_rcnn_inference(
    mask_logits: jnp.ndarray,  # (D, M, M, K)
    classes: jnp.ndarray,  # (D,)
) -> jnp.ndarray:
    """Per-detection probability mask of its predicted class: (D, M, M)."""
    k = mask_logits.shape[-1]
    if k == 1:
        logits = mask_logits[..., 0]
    else:
        cls = jnp.clip(classes, 0, k - 1)
        logits = jnp.take_along_axis(
            mask_logits, cls[:, None, None, None], axis=-1
        )[..., 0]
    return jax.nn.sigmoid(logits)


def paste_masks_in_image(
    masks: jnp.ndarray,  # (D, M, M) probability masks
    boxes: jnp.ndarray,  # (D, 4) XYXY image coords
    image_hw: Tuple[int, int],
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Paste roi masks into full-image masks (layers/mask_ops.py:67).

    Fixed-shape: every output pixel bilinearly samples its source roi
    coordinate (the inverse mapping of the crop), giving (D, H, W) without
    data-dependent slicing. Matches the reference's grid_sample
    (align_corners=False, padding_mode='zeros') semantics exactly:
    out-of-range taps contribute zero, so mask values fade linearly to 0
    over the half-pixel band outside the roi; binarization is
    ``>= threshold`` (mask_ops.py:131).
    """
    D, M, _ = masks.shape
    H, W = image_hw
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5  # pixel centers
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5

    def axis_taps(coords, lo, size):
        # image pixel -> roi grid coordinate (align_corners=False inverse)
        g = (coords - lo) / size * M - 0.5
        i0 = jnp.floor(g).astype(jnp.int32)
        f = g - i0
        i1 = i0 + 1
        # zeros padding: out-of-range taps carry zero weight
        w0 = jnp.where((i0 >= 0) & (i0 < M), 1.0 - f, 0.0)
        w1 = jnp.where((i1 >= 0) & (i1 < M), f, 0.0)
        return jnp.clip(i0, 0, M - 1), jnp.clip(i1, 0, M - 1), w0, w1

    def per_det(mask, box):
        bw = jnp.maximum(box[2] - box[0], 1e-4)
        bh = jnp.maximum(box[3] - box[1], 1e-4)
        x0, x1, wx0, wx1 = axis_taps(xs, box[0], bw)
        y0, y1, wy0, wy1 = axis_taps(ys, box[1], bh)
        top = mask[y0][:, x0] * wx0[None, :] + mask[y0][:, x1] * wx1[None, :]
        bot = mask[y1][:, x0] * wx0[None, :] + mask[y1][:, x1] * wx1[None, :]
        out = top * wy0[:, None] + bot * wy1[:, None]
        if threshold >= 0:
            return out >= threshold
        return out

    return jax.vmap(per_det)(masks, boxes)
