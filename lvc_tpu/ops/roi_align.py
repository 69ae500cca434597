"""Multi-level RoIAlign as fixed-shape XLA gathers.

Replaces the reference's CUDA/CPU RoIAlign kernel
(detectron2/layers/csrc/ROIAlign/ROIAlign_cpu.cpp) and the FPN ``ROIPooler``
(detectron2/modeling/poolers.py:23-246). TPU-first design: instead of
scattering boxes into per-level sub-batches (dynamic shapes), all FPN levels
— and, in the batched path, all images — are flattened into one ``(N, C)``
buffer and each box computes flat sample indices at its assigned level. The
gather is chunked over boxes (``lax.map``) so peak HBM stays bounded at any
batch size.

Semantics matched to the reference at fp32:
- ``aligned=True`` half-pixel convention (coords scaled then offset by 0.5).
- adaptive sampling grid ``ceil(bin_size)`` when ``sampling_ratio == 0``,
  realized as a static max grid with per-box sample masking (capped at
  ``max_grid``; boxes are level-assigned so bins rarely exceed 2).
- bilinear edge rules of ROIAlign_cpu.cpp:66-97 (zero outside
  ``[-1, size]``, clamp-to-edge inside).
"""
from __future__ import annotations

import functools
import math
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
    pos = jnp.stack(
        [
            y_low * w_i + x_low,
            y_low * w_i + x_high,
            y_high * w_i + x_low,
            y_high * w_i + x_high,
        ]
    )
    return pos, w, inside


def _sample_indices_and_weights(
    boxes: jnp.ndarray,  # (R, 4)
    level_shapes: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    output_size: int,
    sampling_ratio: int,
    max_grid: int,
    min_level: int,
    canonical_box_size: int,
    canonical_level: int,
):
    """Per-box flat sample positions/weights over the concatenated-level
    plane. Returns (pos (4,R,P,P,G,G) int32 within SumHW, weights
    (4,R,P,P,G,G) f32, count (R,))."""
    P = output_size
    num_levels = len(level_shapes)
    sizes = [h * w for h, w in level_shapes]
    offsets = [0]
    for s in sizes[:-1]:
        offsets.append(offsets[-1] + s)
    level_offsets = jnp.array(offsets, dtype=jnp.int32)
    heights = jnp.array([h for h, _ in level_shapes], dtype=jnp.float32)
    widths = jnp.array([w for _, w in level_shapes], dtype=jnp.float32)
    scales = jnp.array([1.0 / s for s in strides], dtype=jnp.float32)

    if num_levels > 1:
        levels = assign_boxes_to_levels(
            boxes, min_level, min_level + num_levels - 1, canonical_box_size, canonical_level
        )
    else:
        levels = jnp.zeros((boxes.shape[0],), dtype=jnp.int32)

    scale = scales[levels]
    h_l = heights[levels]
    w_l = widths[levels]
    off_l = level_offsets[levels]

    # aligned=True half-pixel offsets (cpp:141-145)
    x0 = boxes[:, 0] * scale - 0.5
    y0 = boxes[:, 1] * scale - 0.5
    x1 = boxes[:, 2] * scale - 0.5
    y1 = boxes[:, 3] * scale - 0.5
    bin_w = (x1 - x0) / P
    bin_h = (y1 - y0) / P

    if sampling_ratio > 0:
        G = sampling_ratio
        grid_h = jnp.full_like(bin_h, G)
        grid_w = jnp.full_like(bin_w, G)
    else:
        G = max_grid
        grid_h = jnp.clip(jnp.ceil(bin_h), 1, G)
        grid_w = jnp.clip(jnp.ceil(bin_w), 1, G)
    count = jnp.maximum(grid_h * grid_w, 1.0)

    ph = jnp.arange(P, dtype=jnp.float32)
    g = jnp.arange(G, dtype=jnp.float32)

    # (R, P, G): y = y0 + ph*bin_h + (iy+0.5)*bin_h/grid_h (cpp:39-45)
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
    mask_y = g[None, None, :] < grid_h[:, None, None]
    mask_x = g[None, None, :] < grid_w[:, None, None]

    y_full = yy[:, :, None, :, None]
    x_full = xx[:, None, :, None, :]
    y_full, x_full = jnp.broadcast_arrays(y_full, x_full)
    active = mask_y[:, :, None, :, None] & mask_x[:, None, :, None, :]
    active = jnp.broadcast_to(active, y_full.shape)

    hh = h_l[:, None, None, None, None]
    ww = w_l[:, None, None, None, None]
    pos, w, _ = _bilinear_params(y_full, x_full, hh, ww)
    w = jnp.where(active[None], w, 0.0)
    pos = pos + off_l[None, :, None, None, None, None]
    return pos, w, count


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
    """Single-image RoIAlign over FPN levels (unchunked; use the batched
    variant in model code). features: per-level (H_l, W_l, C)."""
    C = features[0].shape[-1]
    dtype = features[0].dtype
    if min_level is None:
        min_level = int(math.log2(strides[0]))
    flat = jnp.concatenate([f.reshape(-1, C) for f in features], axis=0)
    pos, w, count = _sample_indices_and_weights(
        boxes,
        [f.shape[:2] for f in features],
        strides,
        output_size,
        sampling_ratio,
        max_grid,
        min_level,
        canonical_box_size,
        canonical_level,
    )
    vals = flat[pos.reshape(-1)].reshape(pos.shape + (C,))
    weighted = vals * w[..., None].astype(dtype)
    return weighted.sum(axis=(0, 4, 5)) / count[:, None, None, None].astype(dtype)


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
        "chunk",
    ),
)
def batched_multilevel_roi_align(
    features: Sequence[jnp.ndarray],  # per-level (B, H_l, W_l, C)
    boxes: jnp.ndarray,  # (B, R, 4)
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 2,
    min_level: int | None = None,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    chunk: int = 256,
) -> jnp.ndarray:
    """Batched RoIAlign: all images' levels flattened into one buffer, boxes
    processed in fixed-size chunks so peak memory is
    ``chunk * 4 * P^2 * G^2 * C`` floats regardless of batch size.

    Returns (B, R, P, P, C).
    """
    B, R = boxes.shape[:2]
    P = output_size
    C = features[0].shape[-1]
    dtype = features[0].dtype
    if min_level is None:
        min_level = int(math.log2(strides[0]))

    level_shapes = [f.shape[1:3] for f in features]
    sum_hw = sum(h * w for h, w in level_shapes)
    # (B, sum_hw, C) -> (B * sum_hw, C)
    flat = jnp.concatenate([f.reshape(B, -1, C) for f in features], axis=1)
    flat = flat.reshape(B * sum_hw, C)

    all_boxes = boxes.reshape(B * R, 4)
    pos, w, count = _sample_indices_and_weights(
        all_boxes,
        level_shapes,
        strides,
        output_size,
        sampling_ratio,
        max_grid,
        min_level,
        canonical_box_size,
        canonical_level,
    )
    img_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)  # (B*R,)
    pos = pos + (img_idx * sum_hw)[None, :, None, None, None, None]

    G = pos.shape[-1]
    n = B * R
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        pad = n_pad - n
        pos = jnp.pad(pos, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)))
        w = jnp.pad(w, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0), (0, 0)))
        count = jnp.pad(count, (0, pad), constant_values=1.0)

    # (num_chunks, chunk, ...)
    nc = n_pad // chunk
    pos_c = pos.transpose(1, 0, 2, 3, 4, 5).reshape(nc, chunk, 4, P, P, G, G)
    w_c = w.transpose(1, 0, 2, 3, 4, 5).reshape(nc, chunk, 4, P, P, G, G)
    count_c = count.reshape(nc, chunk)

    def do_chunk(args):
        p, ww, cnt = args
        vals = flat[p.reshape(-1)].reshape(p.shape + (C,))
        weighted = vals * ww[..., None].astype(dtype)
        # sum over corners (axis 1) and grid samples (axes 4, 5)
        out = weighted.sum(axis=(1, 4, 5)) / cnt[:, None, None, None].astype(dtype)
        return out  # (chunk, P, P, C)

    out = jax.lax.map(do_chunk, (pos_c, w_c, count_c))  # (nc, chunk, P, P, C)
    out = out.reshape(n_pad, P, P, C)[:n]
    return out.reshape(B, R, P, P, C)
