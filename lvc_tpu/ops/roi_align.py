"""Multi-level RoIAlign as one fixed-shape XLA gather.

Replaces the reference's CUDA/CPU RoIAlign kernel
(detectron2/layers/csrc/ROIAlign/ROIAlign_cpu.cpp) and the FPN ``ROIPooler``
(detectron2/modeling/poolers.py:23-246). TPU-first design: instead of
scattering boxes into per-level sub-batches (dynamic shapes), all FPN levels
are flattened into one ``(sum HW, C)`` buffer and each box computes flat
sample indices at its assigned level — a single batched gather, fully static
shapes, vmap-able over images.

Semantics matched to the reference at fp32:
- ``aligned=True`` half-pixel convention (coords scaled then offset by 0.5).
- adaptive sampling grid ``ceil(bin_size)`` when ``sampling_ratio == 0``,
  realized as a static max grid with per-box sample masking.
- bilinear edge rules of ROIAlign_cpu.cpp:66-97 (zero outside
  ``[-1, size]``, clamp-to-edge inside).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def assign_boxes_to_levels(
    boxes: jnp.ndarray,
    min_level: int,
    max_level: int,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """FPN paper Eqn.(1); reference poolers.py:23-60. Returns offsets from
    min_level in [0, max_level - min_level]."""
    box_area = (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])
    box_sizes = jnp.sqrt(jnp.maximum(box_area, 0.0))
    lvl = jnp.floor(canonical_level + jnp.log2(box_sizes / canonical_box_size + 1e-8))
    lvl = jnp.clip(lvl, min_level, max_level)
    return (lvl - min_level).astype(jnp.int32)


def _bilinear_params(y, x, height, width):
    """Edge rules of ROIAlign_cpu.cpp:56-97, vectorized.

    Returns flat offsets (4, ...) within the level plane, weights (4, ...),
    and an in-bounds mask.
    """
    inside = (y >= -1.0) & (y <= height) & (x >= -1.0) & (x <= width)
    y = jnp.maximum(y, 0.0)
    x = jnp.maximum(x, 0.0)
    y_low = jnp.floor(y).astype(jnp.int32)
    x_low = jnp.floor(x).astype(jnp.int32)
    # if y_low >= height - 1: y_high = y_low = height - 1; y = y_low
    h_i = jnp.asarray(height).astype(jnp.int32)
    w_i = jnp.asarray(width).astype(jnp.int32)
    y_capped = y_low >= h_i - 1
    x_capped = x_low >= w_i - 1
    y_low = jnp.where(y_capped, h_i - 1, y_low)
    x_low = jnp.where(x_capped, w_i - 1, x_low)
    y = jnp.where(y_capped, y_low.astype(y.dtype), y)
    x = jnp.where(x_capped, x_low.astype(x.dtype), x)
    y_high = jnp.where(y_capped, y_low, y_low + 1)
    x_high = jnp.where(x_capped, x_low, x_low + 1)

    ly = y - y_low
    lx = x - x_low
    hy = 1.0 - ly
    hx = 1.0 - lx
    w = jnp.stack([hy * hx, hy * lx, ly * hx, ly * lx])
    w = jnp.where(inside[None], w, 0.0)
    width_i = jnp.asarray(width).astype(jnp.int32)
    pos = jnp.stack(
        [
            y_low * width_i + x_low,
            y_low * width_i + x_high,
            y_high * width_i + x_low,
            y_high * width_i + x_high,
        ]
    )
    return pos, w, inside


@functools.partial(
    jax.jit,
    static_argnames=(
        "strides",
        "output_size",
        "sampling_ratio",
        "max_grid",
        "min_level",
        "canonical_box_size",
        "canonical_level",
    ),
)
def multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 4,
    min_level: int | None = None,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """RoIAlign over FPN levels for one image.

    Args:
        features: per-level (H_l, W_l, C) maps, strides[l] = 2**level.
        boxes: (R, 4) XYXY in image coordinates (padding rows OK — they just
            produce garbage features that downstream masks ignore).
        strides: feature stride per level; spatial_scale = 1/stride.
        sampling_ratio: 0 = adaptive ceil(bin) (reference default), capped at
            ``max_grid``; > 0 = fixed grid.
    Returns:
        (R, output_size, output_size, C) pooled features.
    """
    P = output_size
    C = features[0].shape[-1]
    dtype = features[0].dtype
    if min_level is None:
        import math

        min_level = int(math.log2(strides[0]))
    num_levels = len(features)

    # One flat buffer for all levels -> a single gather source.
    flat = jnp.concatenate([f.reshape(-1, C) for f in features], axis=0)
    sizes = [f.shape[0] * f.shape[1] for f in features]
    offsets = [0]
    for s in sizes[:-1]:
        offsets.append(offsets[-1] + s)
    level_offsets = jnp.array(offsets, dtype=jnp.int32)
    heights = jnp.array([f.shape[0] for f in features], dtype=jnp.float32)
    widths = jnp.array([f.shape[1] for f in features], dtype=jnp.float32)
    scales = jnp.array([1.0 / s for s in strides], dtype=jnp.float32)

    if num_levels > 1:
        levels = assign_boxes_to_levels(
            boxes, min_level, min_level + num_levels - 1, canonical_box_size, canonical_level
        )
    else:
        levels = jnp.zeros((boxes.shape[0],), dtype=jnp.int32)

    scale = scales[levels]  # (R,)
    h_l = heights[levels]
    w_l = widths[levels]
    off_l = level_offsets[levels]

    # aligned=True: continuous coords with half-pixel offset (cpp:141-145).
    x0 = boxes[:, 0] * scale - 0.5
    y0 = boxes[:, 1] * scale - 0.5
    x1 = boxes[:, 2] * scale - 0.5
    y1 = boxes[:, 3] * scale - 0.5
    roi_w = x1 - x0
    roi_h = y1 - y0
    bin_w = roi_w / P
    bin_h = roi_h / P

    if sampling_ratio > 0:
        G = sampling_ratio
        grid_h = jnp.full_like(roi_h, G)
        grid_w = jnp.full_like(roi_w, G)
    else:
        G = max_grid
        # ceil(roi_height / pooled_height) per box (cpp:161-166), capped.
        grid_h = jnp.clip(jnp.ceil(bin_h), 1, G)
        grid_w = jnp.clip(jnp.ceil(bin_w), 1, G)
    count = jnp.maximum(grid_h * grid_w, 1.0)  # (R,)

    ph = jnp.arange(P, dtype=jnp.float32)
    g = jnp.arange(G, dtype=jnp.float32)

    # Sample coords: y = y0 + ph*bin_h + (iy+0.5)*bin_h/grid_h (cpp:39-45).
    # Shapes: (R, P, G)
    yy = (
        y0[:, None, None]
        + ph[None, :, None] * bin_h[:, None, None]
        + (g[None, None, :] + 0.5) * bin_h[:, None, None] / grid_h[:, None, None]
    )
    xx = (
        x0[:, None, None]
        + ph[None, :, None] * bin_w[:, None, None]
        + (g[None, None, :] + 0.5) * bin_w[:, None, None] / grid_w[:, None, None]
    )
    samp_mask_y = g[None, None, :] < grid_h[:, None, None]  # (R, 1->P, G)
    samp_mask_x = g[None, None, :] < grid_w[:, None, None]

    # Broadcast to full sample grid (R, P, P, G, G)
    y_full = yy[:, :, None, :, None]
    x_full = xx[:, None, :, None, :]
    y_full, x_full = jnp.broadcast_arrays(y_full, x_full)
    active = samp_mask_y[:, :, None, :, None] & samp_mask_x[:, None, :, None, :]
    active = jnp.broadcast_to(active, y_full.shape)

    hh = h_l[:, None, None, None, None]
    ww = w_l[:, None, None, None, None]
    pos, w, _ = _bilinear_params(y_full, x_full, hh, ww)
    w = jnp.where(active[None], w, 0.0)
    flat_idx = pos + off_l[None, :, None, None, None, None]

    # Gather: (4, R, P, P, G, G, C)
    vals = flat[flat_idx.reshape(-1)].reshape(flat_idx.shape + (C,))
    weighted = vals * w[..., None].astype(dtype)
    # sum over 4 corners and grid samples, divide by adaptive count
    out = weighted.sum(axis=(0, 4, 5)) / count[:, None, None, None].astype(dtype)
    return out  # (R, P, P, C)


def batched_multilevel_roi_align(features, boxes, strides, **kwargs):
    """vmap over the image batch: features (B, H, W, C) per level, boxes (B, R, 4)."""
    fn = lambda fs, bx: multilevel_roi_align(fs, bx, strides, **kwargs)
    return jax.vmap(fn)(features, boxes)
