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

from lvc_tpu.ops.pallas_util import out_vma


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
        "tile",
        "chunk",
    ),
)
def batched_multilevel_roi_align_tiled(
    features: Sequence[jnp.ndarray],  # per-level (B, H_l, W_l, C)
    boxes: jnp.ndarray,  # (B, R, 4)
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 2,
    min_level: int | None = None,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    tile: int = 48,
    chunk: int = 256,
) -> jnp.ndarray:
    """RoIAlign restructured for TPU memory bandwidth.

    The point-gather formulation (``batched_multilevel_roi_align``) issues
    one 512 B row-gather per bilinear corner — measured ~45 GB/s on a v5e
    chip, 100 ms for an R-101-FPN batch. Here each of a box's 2*P*G sample
    rows fetches ONE contiguous ``(2, tile, C)`` block via a batched
    dynamic-slice (a multi-KB DMA), and the bilinear x-interpolation
    becomes a small per-box einsum on the MXU. Same sampling semantics as
    the exact kernel (aligned=True, adaptive grid capped at ``max_grid``,
    edge rules of ROIAlign_cpu.cpp); the one approximation: boxes whose
    per-axis footprint on their assigned level exceeds ``tile - 2`` pixels
    (degenerate aspect ratios; impossible for in-image boxes at the
    canonical levels with tile=48) have their sample columns clamped into
    the tile window.

    Returns (B, R, P, P, C).
    """
    B, R = boxes.shape[:2]
    P = output_size
    flat, starts, Wx, wy, count, G, dtype = _tiled_prep(
        features, boxes, strides, output_size, sampling_ratio, max_grid,
        min_level, canonical_box_size, canonical_level, tile,
    )
    n = B * R
    C = features[0].shape[-1]
    q = P * G

    # ---- chunked fetch + interpolate -----------------------------------
    n_pad = ((n + chunk - 1) // chunk) * chunk
    if n_pad != n:
        pad = n_pad - n
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        Wx = jnp.pad(Wx, ((0, pad), (0, 0), (0, 0)))
        wy = jnp.pad(wy, ((0, pad), (0, 0), (0, 0)))
        count = jnp.pad(count, (0, pad), constant_values=1.0)
    nc = n_pad // chunk

    slice_one = lambda s: jax.lax.dynamic_slice(flat, (s, 0), (tile, C))

    def do_chunk(args):
        st, wxc, wyc, cnt = args
        # (chunk, P*G*2, tile, C): each sample row's two corner rows
        tiles = jax.vmap(jax.vmap(slice_one))(st)
        tiles = tiles.reshape(chunk, P * G, 2, tile, C)
        # y-interp: (chunk, P*G, tile, C)
        rows_mix = jnp.einsum(
            "nrj,nrjtc->nrtc", wyc, tiles, precision=jax.lax.Precision.HIGHEST
        )
        # x-interp: (chunk, P*G rows, P*G cols, C). HIGHEST precision: the
        # default matmul precision truncates f32 operands to bf16 on TPU,
        # which would corrupt the interpolation weights.
        vals = jnp.einsum(
            "nqt,nrtc->nrqc", wxc, rows_mix,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        v = vals.reshape(chunk, P, G, P, G, C)
        pooled = v.sum(axis=(2, 4)) / cnt[:, None, None, None]
        return pooled.astype(dtype)  # (chunk, P, P, C)

    out = jax.lax.map(
        do_chunk,
        (
            starts.reshape(nc, chunk, P * G * 2),
            Wx.reshape(nc, chunk, q, tile),
            wy.reshape(nc, chunk, P * G, 2),
            count.reshape(nc, chunk),
        ),
    )
    out = out.reshape(n_pad, P, P, C)[:n]
    return out.reshape(B, R, P, P, C)


def _tiled_prep(
    features, boxes, strides, output_size, sampling_ratio, max_grid,
    min_level, canonical_box_size, canonical_level, tile,
):
    """Shared host-side math of the tiled/pallas RoIAlign: per-box slice
    starts into the flattened level buffer, the one-hot x-interpolation
    matrix, y-corner weights (grid/inside masks folded in), and sample
    counts. Returns (flat, starts, Wx, wy, count, G, dtype)."""
    B, R = boxes.shape[:2]
    P = output_size
    G = max_grid if sampling_ratio <= 0 else sampling_ratio
    C = features[0].shape[-1]
    dtype = features[0].dtype
    if min_level is None:
        min_level = int(math.log2(strides[0]))

    level_shapes = [f.shape[1:3] for f in features]
    sum_hw = sum(h * w for h, w in level_shapes)
    flat = jnp.concatenate([f.reshape(B, -1, C) for f in features], axis=1)
    flat = flat.reshape(B * sum_hw, C)
    # padding rows so edge slices never read out of bounds
    flat = jnp.pad(flat, ((0, tile), (0, 0)))

    offsets = [0]
    for h, w in level_shapes[:-1]:
        offsets.append(offsets[-1] + h * w)
    level_offsets = jnp.array(offsets, jnp.int32)
    heights = jnp.array([h for h, _ in level_shapes], jnp.float32)
    widths = jnp.array([w for _, w in level_shapes], jnp.float32)
    scales = jnp.array([1.0 / s for s in strides], jnp.float32)

    all_boxes = boxes.reshape(B * R, 4)
    n = B * R
    img_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)

    if len(level_shapes) > 1:
        levels = assign_boxes_to_levels(
            all_boxes, min_level, min_level + len(level_shapes) - 1,
            canonical_box_size, canonical_level,
        )
        # level bump: a box whose per-axis footprint on its canonical level
        # exceeds the tile budget (extreme aspect ratio) moves to a coarser
        # level so its samples fit — gentler than clamping sample columns.
        # At the top level any in-image box fits (image/stride << tile).
        budget = float(tile - 4)
        max_side = jnp.maximum(
            all_boxes[:, 2] - all_boxes[:, 0], all_boxes[:, 3] - all_boxes[:, 1]
        )
        fp = max_side / jnp.asarray(
            [float(s) for s in strides], jnp.float32
        )[levels]
        need = jnp.ceil(jnp.log2(jnp.maximum(fp / budget, 1.0))).astype(jnp.int32)
        levels = jnp.minimum(levels + need, len(level_shapes) - 1)
    else:
        levels = jnp.zeros((n,), jnp.int32)

    scale = scales[levels]
    h_l = heights[levels]
    w_l = widths[levels]
    off_l = level_offsets[levels] + img_idx * sum_hw

    x0 = all_boxes[:, 0] * scale - 0.5
    y0 = all_boxes[:, 1] * scale - 0.5
    # degenerate (x1 < x0) boxes are treated as empty: the tile-window
    # math assumes non-decreasing sample positions
    x1 = jnp.maximum(all_boxes[:, 2] * scale - 0.5, x0)
    y1 = jnp.maximum(all_boxes[:, 3] * scale - 0.5, y0)
    bin_w = (x1 - x0) / P
    bin_h = (y1 - y0) / P

    if sampling_ratio > 0:
        grid_w = jnp.full_like(bin_w, G)
        grid_h = jnp.full_like(bin_h, G)
    else:
        grid_w = jnp.clip(jnp.ceil(bin_w), 1, G)
        grid_h = jnp.clip(jnp.ceil(bin_h), 1, G)
    count = jnp.maximum(grid_h * grid_w, 1.0)  # (n,)

    # sample positions (n, P, G) on each axis; the reference's per-grid
    # center rule (cpp:39-45): pos = o0 + p*bin + (g+0.5)*bin/grid
    p_ar = jnp.arange(P, dtype=jnp.float32)
    g_ar = jnp.arange(G, dtype=jnp.float32)

    def axis_samples(o0, bin_sz, grid):
        pos = (
            o0[:, None, None]
            + p_ar[None, :, None] * bin_sz[:, None, None]
            + (g_ar[None, None, :] + 0.5) * bin_sz[:, None, None] / grid[:, None, None]
        )
        valid = g_ar[None, None, :] < grid[:, None, None]  # (n, P, G)
        return pos, valid

    xs, x_valid = axis_samples(x0, bin_w, grid_w)  # (n, P, G)
    ys, y_valid = axis_samples(y0, bin_h, grid_h)

    # ---- per-axis bilinear corner math (edge rules of cpp:56-97) -------
    def corners(v, size):
        inside = (v >= -1.0) & (v <= size[:, None, None])
        v = jnp.maximum(v, 0.0)
        low = jnp.floor(v).astype(jnp.int32)
        sz = size.astype(jnp.int32)
        capped = low >= sz[:, None, None] - 1
        low = jnp.where(capped, sz[:, None, None] - 1, low)
        frac = jnp.where(capped, 0.0, v - low)
        return low, frac, inside

    x_low, lx, x_inside = corners(xs, w_l)  # (n, P, G)
    y_low, ly, y_inside = corners(ys, h_l)

    # ---- tile window per box ------------------------------------------
    # window start: first sample's x_low; degenerate boxes clamp into it
    x_start = x_low[:, 0, 0]  # (n,) minimal sample column
    t_low = jnp.clip(x_low - x_start[:, None, None], 0, tile - 2)
    wx0 = jnp.where(x_inside & x_valid, (1.0 - lx), 0.0)  # weight at t_low
    wx1 = jnp.where(x_inside & x_valid, lx, 0.0)  # weight at t_low + 1

    # one-hot x-interp matrix (n, P*G, tile)
    t_iota = jnp.arange(tile, dtype=jnp.int32)
    q = P * G
    t_low_f = t_low.reshape(n, q)
    wx0_f = wx0.reshape(n, q)
    wx1_f = wx1.reshape(n, q)
    Wx = (
        wx0_f[..., None] * (t_iota[None, None, :] == t_low_f[..., None])
        + wx1_f[..., None] * (t_iota[None, None, :] == (t_low_f + 1)[..., None])
    ).astype(dtype)  # (n, q, tile)

    # ---- slice starts: (n, P*G rows, 2 y-corners) ----------------------
    h_i = h_l.astype(jnp.int32)
    w_i = w_l.astype(jnp.int32)
    y_high = jnp.minimum(y_low + 1, h_i[:, None, None] - 1)
    rows = jnp.stack([y_low, y_high], axis=-1)  # (n, P, G, 2)
    starts = (
        off_l[:, None, None, None]
        + rows * w_i[:, None, None, None]
        + x_start[:, None, None, None]
    ).reshape(n, P * G * 2)

    wy = jnp.stack([1.0 - ly, ly], axis=-1)  # (n, P, G, 2)
    wy = jnp.where((y_inside & y_valid)[..., None], wy, 0.0)
    wy = wy.reshape(n, P * G, 2).astype(dtype)

    return flat, starts, Wx, wy, count, G, dtype


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


# ---------------------------------------------------------------------------
# Pallas RoIAlign: double-buffered per-box DMA + on-chip interpolation.
# ---------------------------------------------------------------------------


def _pallas_roi_kernel(P, G, tile, C, rpg2, group, depth=2):
    """Kernel body factory. Per grid step (= ``group`` boxes):
      1. start every box's 2*P*G contiguous slice DMAs up front,
      2. per box: wait its DMAs (later boxes' copies overlap this box's
         compute), y-mix the 2 corner rows of each sample row (VPU, scalar
         weights from SMEM), x-interpolate via one (P, tile) x (tile, C)
         MXU dot, normalize by the sample count.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c2 = C // 128

    def kernel(
        starts_ref,  # SMEM (group, rpg2) int32 — row offsets into flat
        starts_nxt,  # SMEM (group, rpg2) int32 — next grid step's offsets
        wy_ref,      # SMEM (group, rpg2) f32: y weight per slice row
        cnt_ref,     # SMEM (group, 1) f32
        wx_ref,      # VMEM (group, P, tile) f32 (gx-summed one-hot interp)
        flat_ref,    # HBM (N, c2, 128) — dynamic slicing of dim 0 is free
                     # of Mosaic's tiling-alignment rules (the tiled dims
                     # are the trailing two)
        out_ref,     # VMEM (group, P, P, C)
        tiles,       # VMEM scratch (2, group, rpg2, tile, c2, 128)
        rows_sum,    # VMEM scratch (P, tile, c2, 128) f32
        sems,        # DMA sems (2, group, rpg2)
    ):
        i = pl.program_id(0)
        nprog = pl.num_programs(0)
        slot = jax.lax.rem(i, depth) if depth > 1 else 0
        nxt = jax.lax.rem(i + 1, depth) if depth > 1 else 0

        def dma(s, b, r, st):
            # the 2*P*G copies of one box share a semaphore (the sflag
            # space holds only ~512 semaphores); each wait() consumes one
            # completion signal, so waiting rpg2 times drains the box
            return pltpu.make_async_copy(
                flat_ref.at[pl.ds(st[b, r], tile)],
                tiles.at[s, b, r],
                sems.at[s, b],
            )

        if depth > 1:
            # warm-up: first step fetches its own group
            @pl.when(i == 0)
            def _():
                for b in range(group):
                    for r in range(rpg2):
                        dma(0, b, r, starts_ref).start()

            # prefetch the NEXT group while this one computes
            @pl.when(i + 1 < nprog)
            def _():
                for b in range(group):
                    for r in range(rpg2):
                        dma(nxt, b, r, starts_nxt).start()
        else:
            for b in range(group):
                for r in range(rpg2):
                    dma(0, b, r, starts_ref).start()

        k_per = 2 * G
        for b in range(group):
            for r in range(rpg2):
                dma(slot, b, r, starts_ref).wait()
            # y-mix: rows_sum[py] = sum_k wy[py*2G+k] * tiles[b, py*2G+k]
            for py in range(P):
                acc = None
                for k in range(k_per):
                    r = py * k_per + k
                    term = tiles[slot, b, r].astype(jnp.float32) * wy_ref[b, r]
                    acc = term if acc is None else acc + term
                rows_sum[py] = acc
            # x-interp, one 2D MXU dot per (output row, 128-channel slab):
            # (P, tile) x (tile, 128) -> (px, 128). HIGHEST keeps the f32
            # interp weights from bf16 truncation.
            inv = 1.0 / cnt_ref[b, 0]
            for py in range(P):
                for c in range(c2):
                    v = jax.lax.dot_general(
                        wx_ref[b],
                        rows_sum[py, :, c],
                        (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )  # (px, 128)
                    out_ref[b, py, :, c * 128 : (c + 1) * 128] = (v * inv).astype(
                        out_ref.dtype
                    )

    return kernel


def batched_multilevel_roi_align_pallas(
    features: Sequence[jnp.ndarray],  # per-level (B, H_l, W_l, C)
    boxes: jnp.ndarray,  # (B, R, 4)
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 2,
    min_level: int | None = None,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    tile: int = 48,
    interpret: bool = False,
) -> jnp.ndarray:
    """Multi-level RoIAlign as a Pallas TPU kernel.

    Same sampling semantics as ``batched_multilevel_roi_align_tiled``
    (shared ``_tiled_prep``); the device side replaces XLA's point gather
    (measured ~45 GB/s on v5e) with explicit double-buffered DMAs: each box
    issues 2*P*G contiguous ``tile * C`` slice copies (24 KB each at
    tile=48, C=256) into VMEM while the previous box computes, so the
    pooling runs at streaming bandwidth with the bilinear math on the
    VPU/MXU. Returns (B, R, P, P, C).
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R = boxes.shape[:2]
    P = output_size
    C = features[0].shape[-1]
    # Channels must split into (C // 128, 128) slabs whose slab count is a
    # multiple of the dtype's sublane packing (f32: 1, bf16: 2, int8: 4).
    packing = max(1, 4 // features[0].dtype.itemsize)
    c_mult = 128 * packing
    c_pad = (-C) % c_mult
    if c_pad:
        features = [jnp.pad(f, ((0, 0),) * 3 + ((0, c_pad),)) for f in features]
    flat, starts, Wx, wy, count, G, dtype = _tiled_prep(
        features, boxes, strides, output_size, sampling_ratio, max_grid,
        min_level, canonical_box_size, canonical_level, tile,
    )
    n = B * R
    C = features[0].shape[-1]
    rpg2 = P * G * 2
    group = 8  # boxes per grid step (SMEM blocks need sublane % 8 == 0)

    # fold the gx sum into the x-interp matrix: (n, P*G, tile) -> (n, P, tile)
    WxB = Wx.reshape(n, P, G, tile).sum(axis=2).astype(jnp.float32)
    # per-slice-row y weight, ordered (py, gy, corner) to match `starts`
    wy_flat = wy.reshape(n, P * G, 2).reshape(n, rpg2).astype(jnp.float32)
    cnt = count.reshape(n, 1).astype(jnp.float32)

    n_pad = ((n + group - 1) // group) * group
    if n_pad != n:
        pad = n_pad - n
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        WxB = jnp.pad(WxB, ((0, pad), (0, 0), (0, 0)))
        wy_flat = jnp.pad(wy_flat, ((0, pad), (0, 0)))
        cnt = jnp.pad(cnt, ((0, pad), (0, 0)), constant_values=1.0)

    # one extra (duplicate) block so the i+1 prefetch index map stays in range
    starts_ext = jnp.concatenate([starts, starts[-group:]], axis=0)

    # cross-group double buffering for 2-byte dtypes; f32 tiles are 2x the
    # bytes and two buffers would exceed VMEM, so it single-buffers
    depth = 2 if jnp.dtype(dtype).itemsize <= 2 else 1
    kernel = _pallas_roi_kernel(P, G, tile, C, rpg2, group, depth)
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[
            pl.BlockSpec((group, rpg2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, rpg2), lambda i: (i + 1, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, rpg2), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, P, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (group, P, P, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, P, P, C), dtype, vma=out_vma(WxB, wy_flat, cnt)
        ),
        scratch_shapes=[
            pltpu.VMEM((depth, group, rpg2, tile, C // 128, 128), dtype),
            pltpu.VMEM((P, tile, C // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((depth, group)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts_ext, starts_ext, wy_flat, cnt, WxB, flat.reshape(-1, C // 128, 128))
    out = out[:n].reshape(B, R, P, P, C)
    return out[..., : C - c_pad] if c_pad else out


@functools.partial(
    jax.jit,
    static_argnames=("spatial_scale", "output_size", "sampling_ratio", "max_grid", "aligned"),
)
def roi_align_rotated(
    feature: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 4,
    aligned: bool = True,
) -> jnp.ndarray:
    """RoIAlign over rotated XYWHA boxes on a single feature level.

    Counterpart of the reference's ROIAlignRotated CUDA/CPU kernel
    (detectron2/layers/csrc/ROIAlignRotated/, 1,080 LoC): the regular
    RoIAlign sample lattice is generated in the box frame (origin at the box
    center) and rotated by the box angle before the bilinear gather. Same
    ``aligned`` half-pixel convention and adaptive ``ceil(bin)`` grid rule as
    :func:`multilevel_roi_align`, realized as a static ``max_grid`` lattice
    with per-box sample masking.

    Args:
        feature: (H, W, C) one level.
        rois: (R, 5) ``(cx, cy, w, h, angle_deg)`` in input-image coords,
            angle CCW (d2 convention).
    Returns:
        (R, P, P, C) pooled features.
    """
    H, W, C = feature.shape
    dtype = feature.dtype
    P = output_size
    offset = 0.5 if aligned else 0.0

    cx = rois[:, 0] * spatial_scale - offset
    cy = rois[:, 1] * spatial_scale - offset
    roi_w = rois[:, 2] * spatial_scale
    roi_h = rois[:, 3] * spatial_scale
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    theta = rois[:, 4] * (math.pi / 180.0)
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)

    bin_h = roi_h / P
    bin_w = roi_w / P
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
    # box-frame lattice, origin at the roi center (start = -roi_size/2)
    yy = (
        -roi_h[:, None, None] / 2.0
        + ph[None, :, None] * bin_h[:, None, None]
        + (g[None, None, :] + 0.5) * bin_h[:, None, None] / grid_h[:, None, None]
    )  # (R, P, G)
    xx = (
        -roi_w[:, None, None] / 2.0
        + ph[None, :, None] * bin_w[:, None, None]
        + (g[None, None, :] + 0.5) * bin_w[:, None, None] / grid_w[:, None, None]
    )
    mask_y = g[None, None, :] < grid_h[:, None, None]
    mask_x = g[None, None, :] < grid_w[:, None, None]

    yy_f = yy[:, :, None, :, None]
    xx_f = xx[:, None, :, None, :]
    yy_f, xx_f = jnp.broadcast_arrays(yy_f, xx_f)  # (R, P, P, G, G)
    active = mask_y[:, :, None, :, None] & mask_x[:, None, :, None, :]
    active = jnp.broadcast_to(active, yy_f.shape)

    c5 = cos_t[:, None, None, None, None]
    s5 = sin_t[:, None, None, None, None]
    # rotate the lattice into image coords around the roi center
    y = yy_f * c5 - xx_f * s5 + cy[:, None, None, None, None]
    x = yy_f * s5 + xx_f * c5 + cx[:, None, None, None, None]

    pos, w, _ = _bilinear_params(y, x, float(H), float(W))
    w = jnp.where(active[None], w, 0.0)
    flat = feature.reshape(-1, C)
    vals = flat[pos.reshape(-1)].reshape(pos.shape + (C,))
    weighted = vals * w[..., None].astype(dtype)
    return weighted.sum(axis=(0, 4, 5)) / count[:, None, None, None].astype(dtype)


def _tiled_prep_2d(
    features, boxes, strides, output_size, sampling_ratio, max_grid,
    min_level, canonical_box_size, canonical_level, tile,
):
    """Row-pair variant of :func:`_tiled_prep` for the paired-DMA kernel.

    Levels are padded to a common width and laid out as one
    ``(total_rows, W0, C)`` plane so the two bilinear corner rows of a
    sample (y_low, y_low+1) are ADJACENT leading-dim indices — one strided
    DMA fetches both. Returns (flat2d, row_starts (n, P*G), x_start (n,),
    Wx (n, P*G, tile), wy (n, P*G, 2), count, G, dtype).
    """
    B, R = boxes.shape[:2]
    P = output_size
    G = max_grid if sampling_ratio <= 0 else sampling_ratio
    C = features[0].shape[-1]
    dtype = features[0].dtype
    if min_level is None:
        min_level = int(math.log2(strides[0]))

    level_shapes = [f.shape[1:3] for f in features]
    W0 = max(w for _, w in level_shapes)
    sum_h = sum(h for h, _ in level_shapes)
    # (B, sum_h, W0, C): per-image stacked level planes at common width
    padded = [
        jnp.pad(f, ((0, 0), (0, 0), (0, W0 - f.shape[2]), (0, 0)))
        for f in features
    ]
    flat2d = jnp.concatenate(padded, axis=1).reshape(B * sum_h, W0, C)
    # +2 pad rows + tile pad cols: edge slices never read out of bounds
    flat2d = jnp.pad(flat2d, ((0, 2), (0, tile), (0, 0)))

    row_offsets = [0]
    for h, _ in level_shapes[:-1]:
        row_offsets.append(row_offsets[-1] + h)
    level_row_offsets = jnp.array(row_offsets, jnp.int32)
    heights = jnp.array([h for h, _ in level_shapes], jnp.float32)
    widths = jnp.array([w for _, w in level_shapes], jnp.float32)
    scales = jnp.array([1.0 / s for s in strides], jnp.float32)

    all_boxes = boxes.reshape(B * R, 4)
    n = B * R
    img_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)

    if len(level_shapes) > 1:
        levels = assign_boxes_to_levels(
            all_boxes, min_level, min_level + len(level_shapes) - 1,
            canonical_box_size, canonical_level,
        )
        # same level-bump rule as _tiled_prep (footprint must fit the tile)
        budget = float(tile - 4)
        max_side = jnp.maximum(
            all_boxes[:, 2] - all_boxes[:, 0], all_boxes[:, 3] - all_boxes[:, 1]
        )
        fp = max_side / jnp.asarray(
            [float(s) for s in strides], jnp.float32
        )[levels]
        need = jnp.ceil(jnp.log2(jnp.maximum(fp / budget, 1.0))).astype(jnp.int32)
        levels = jnp.minimum(levels + need, len(level_shapes) - 1)
    else:
        levels = jnp.zeros((n,), jnp.int32)

    scale = scales[levels]
    h_l = heights[levels]
    w_l = widths[levels]
    row_off = level_row_offsets[levels] + img_idx * sum_h

    x0 = all_boxes[:, 0] * scale - 0.5
    y0 = all_boxes[:, 1] * scale - 0.5
    x1 = jnp.maximum(all_boxes[:, 2] * scale - 0.5, x0)
    y1 = jnp.maximum(all_boxes[:, 3] * scale - 0.5, y0)
    bin_w = (x1 - x0) / P
    bin_h = (y1 - y0) / P

    if sampling_ratio > 0:
        grid_w = jnp.full_like(bin_w, G)
        grid_h = jnp.full_like(bin_h, G)
    else:
        grid_w = jnp.clip(jnp.ceil(bin_w), 1, G)
        grid_h = jnp.clip(jnp.ceil(bin_h), 1, G)
    count = jnp.maximum(grid_h * grid_w, 1.0)

    p_ar = jnp.arange(P, dtype=jnp.float32)
    g_ar = jnp.arange(G, dtype=jnp.float32)

    def axis_samples(o0, bin_sz, grid):
        pos = (
            o0[:, None, None]
            + p_ar[None, :, None] * bin_sz[:, None, None]
            + (g_ar[None, None, :] + 0.5) * bin_sz[:, None, None] / grid[:, None, None]
        )
        valid = g_ar[None, None, :] < grid[:, None, None]
        return pos, valid

    xs, x_valid = axis_samples(x0, bin_w, grid_w)
    ys, y_valid = axis_samples(y0, bin_h, grid_h)

    def corners(v, size):
        inside = (v >= -1.0) & (v <= size[:, None, None])
        v = jnp.maximum(v, 0.0)
        low = jnp.floor(v).astype(jnp.int32)
        sz = size.astype(jnp.int32)
        capped = low >= sz[:, None, None] - 1
        low = jnp.where(capped, sz[:, None, None] - 1, low)
        frac = jnp.where(capped, 0.0, v - low)
        return low, frac, inside

    x_low, lx, x_inside = corners(xs, w_l)
    y_low, ly, y_inside = corners(ys, h_l)

    x_start = x_low[:, 0, 0]
    t_low = jnp.clip(x_low - x_start[:, None, None], 0, tile - 2)
    wx0 = jnp.where(x_inside & x_valid, (1.0 - lx), 0.0)
    wx1 = jnp.where(x_inside & x_valid, lx, 0.0)

    t_iota = jnp.arange(tile, dtype=jnp.int32)
    q = P * G
    t_low_f = t_low.reshape(n, q)
    Wx = (
        wx0.reshape(n, q)[..., None] * (t_iota[None, None, :] == t_low_f[..., None])
        + wx1.reshape(n, q)[..., None]
        * (t_iota[None, None, :] == (t_low_f + 1)[..., None])
    ).astype(dtype)

    # row start of the 2-row corner pair; row y_low+1 may be a pad/next-level
    # row, but its weight is 0 whenever the corner was capped or outside
    row_starts = (row_off[:, None, None] + y_low).reshape(n, q)
    wy = jnp.stack([1.0 - ly, ly], axis=-1)
    wy = jnp.where((y_inside & y_valid)[..., None], wy, 0.0)
    wy = wy.reshape(n, q, 2).astype(jnp.float32)

    return flat2d, row_starts, x_start.astype(jnp.int32), Wx, wy, count, G, dtype


def _pallas_roi_kernel_paired(P, G, tile, C, group, depth=2):
    """Paired-DMA kernel body: one strided (2, tile) DMA per (box, py, gy)
    corner pair — half the DMA descriptors of the row-wise kernel for the
    same bytes, so the scalar core stops being the bottleneck."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c2 = C // 128
    q = P * G

    def kernel(
        rows_ref,   # SMEM (group, q) int32 — first corner row index
        rows_nxt,   # SMEM (group, q) int32 — next grid step's rows
        xs_ref,     # SMEM (group, 1) int32 — per-box x window start
        xs_nxt,     # SMEM (group, 1) int32
        wy_ref,     # SMEM (group, 2*q) f32 — (corner0, corner1) weights
        cnt_ref,    # SMEM (group, 1) f32
        wx_ref,     # VMEM (group, P, tile)
        flat_ref,   # ANY (rows, W0, c2, 128)
        out_ref,    # VMEM (group, P, P, C)
        tiles,      # VMEM scratch (depth, group, q, 2, tile, c2, 128)
        rows_sum,   # VMEM scratch (P, tile, c2, 128) f32
        sems,       # DMA sems (depth, group)
    ):
        i = pl.program_id(0)
        nprog = pl.num_programs(0)
        slot = jax.lax.rem(i, depth) if depth > 1 else 0
        nxt = jax.lax.rem(i + 1, depth) if depth > 1 else 0

        def dma(s, b, r, rows, xs):
            return pltpu.make_async_copy(
                flat_ref.at[pl.ds(rows[b, r], 2), pl.ds(xs[b, 0], tile)],
                tiles.at[s, b, r],
                sems.at[s, b],
            )

        if depth > 1:
            @pl.when(i == 0)
            def _():
                for b in range(group):
                    for r in range(q):
                        dma(0, b, r, rows_ref, xs_ref).start()

            @pl.when(i + 1 < nprog)
            def _():
                for b in range(group):
                    for r in range(q):
                        dma(nxt, b, r, rows_nxt, xs_nxt).start()
        else:
            for b in range(group):
                for r in range(q):
                    dma(0, b, r, rows_ref, xs_ref).start()

        for b in range(group):
            for r in range(q):
                dma(slot, b, r, rows_ref, xs_ref).wait()
            # y-mix the corner pairs: rows_sum[py] =
            #   sum_g wy0 * tiles[.., py*G+g, 0] + wy1 * tiles[.., py*G+g, 1]
            for py in range(P):
                acc = None
                for g in range(G):
                    r = py * G + g
                    t0 = tiles[slot, b, r, 0].astype(jnp.float32) * wy_ref[b, 2 * r]
                    t1 = tiles[slot, b, r, 1].astype(jnp.float32) * wy_ref[b, 2 * r + 1]
                    term = t0 + t1
                    acc = term if acc is None else acc + term
                rows_sum[py] = acc
            inv = 1.0 / cnt_ref[b, 0]
            for py in range(P):
                for c in range(c2):
                    v = jax.lax.dot_general(
                        wx_ref[b],
                        rows_sum[py, :, c],
                        (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )
                    out_ref[b, py, :, c * 128 : (c + 1) * 128] = (v * inv).astype(
                        out_ref.dtype
                    )

    return kernel


def batched_multilevel_roi_align_pallas_paired(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 2,
    min_level: int | None = None,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    tile: int = 48,
    interpret: bool = False,
) -> jnp.ndarray:
    """Paired-DMA Pallas RoIAlign (same semantics as the row-wise kernel;
    P*G strided 2-row DMAs per box instead of 2*P*G 1-row DMAs)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R = boxes.shape[:2]
    P = output_size
    C = features[0].shape[-1]
    packing = max(1, 4 // features[0].dtype.itemsize)
    c_mult = 128 * packing
    c_pad = (-C) % c_mult
    if c_pad:
        features = [jnp.pad(f, ((0, 0),) * 3 + ((0, c_pad),)) for f in features]
    flat2d, row_starts, x_start, Wx, wy, count, G, dtype = _tiled_prep_2d(
        features, boxes, strides, output_size, sampling_ratio, max_grid,
        min_level, canonical_box_size, canonical_level, tile,
    )
    n = B * R
    C = features[0].shape[-1]
    q = P * G
    # scoped VMEM is ~16MB; the DMA scratch is depth*group*q*2*tile*C
    # elements (+ the f32 accumulator and the (group, P, P, C) out block).
    # group=8/depth=2 fits the box head (P=7) but blows the budget at the
    # mask pooler's P=14 — shrink group (then depth) to stay under 12MB.
    depth = 2 if jnp.dtype(dtype).itemsize <= 2 else 1
    budget = 12 * 1024 * 1024
    group = 8
    itemsize = jnp.dtype(dtype).itemsize

    def scratch_bytes(g, d):
        return (
            d * g * q * 2 * tile * C * itemsize
            + P * tile * C * 4
            + g * P * P * C * itemsize
        )

    while group > 1 and scratch_bytes(group, depth) > budget:
        group //= 2
    if depth == 2 and scratch_bytes(group, depth) > budget:
        depth = 1

    WxB = Wx.reshape(n, P, G, tile).sum(axis=2).astype(jnp.float32)
    wy_flat = wy.reshape(n, 2 * q)
    cnt = count.reshape(n, 1).astype(jnp.float32)
    xs = x_start.reshape(n, 1)

    n_pad = ((n + group - 1) // group) * group
    if n_pad != n:
        pad = n_pad - n
        row_starts = jnp.pad(row_starts, ((0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
        WxB = jnp.pad(WxB, ((0, pad), (0, 0), (0, 0)))
        wy_flat = jnp.pad(wy_flat, ((0, pad), (0, 0)))
        cnt = jnp.pad(cnt, ((0, pad), (0, 0)), constant_values=1.0)

    rows_ext = jnp.concatenate([row_starts, row_starts[-group:]], axis=0)
    xs_ext = jnp.concatenate([xs, xs[-group:]], axis=0)

    kernel = _pallas_roi_kernel_paired(P, G, tile, C, group, depth)
    W0 = flat2d.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[
            pl.BlockSpec((group, q), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, q), lambda i: (i + 1, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i + 1, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 2 * q), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, P, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (group, P, P, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, P, P, C), dtype, vma=out_vma(WxB, wy_flat, cnt)
        ),
        scratch_shapes=[
            pltpu.VMEM((depth, group, q, 2, tile, C // 128, 128), dtype),
            pltpu.VMEM((P, tile, C // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((depth, group)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        rows_ext, rows_ext, xs_ext, xs_ext, wy_flat, cnt, WxB,
        flat2d.reshape(flat2d.shape[0], W0, C // 128, 128),
    )
    out = out[:n].reshape(B, R, P, P, C)
    return out[..., : C - c_pad] if c_pad else out


def _tiled_prep_band(
    features, boxes, strides, output_size, sampling_ratio, max_grid,
    min_level, canonical_box_size, canonical_level, tile,
    row_pad=4,
    per_level=False,
    no_pad=False,
):
    """Band variant of :func:`_tiled_prep_2d` for the serving "fast" kernel.

    The level-fit budget is ``tile - 4`` on BOTH axes (vs the x axis only in
    the exact kernels), which caps ``bin <= (tile-4)/P`` after the level
    bump. With tile=32 that means bin <= 4, so ALL of one output row's
    sample rows (both gy grid points x both bilinear corners) live within a
    4-row band starting at the first corner row — one strided (4, tile) DMA
    per (box, py). Boxes with footprint in (28, 44] pool one level coarser
    than the reference's sqrt-area rule; this is the only semantic deviation
    (an opt-in serving trade, pooler_impl="pallas_fast").

    Returns (flat2d, band_starts (n, P), x_start (n,), Wx (n, P*G, tile),
    Wy4 (n, P, 4), count, G, dtype).
    """
    B, R = boxes.shape[:2]
    P = output_size
    G = max_grid if sampling_ratio <= 0 else sampling_ratio
    C = features[0].shape[-1]
    dtype = features[0].dtype
    if min_level is None:
        min_level = int(math.log2(strides[0]))

    level_shapes = [f.shape[1:3] for f in features]
    W0 = max(w for _, w in level_shapes)
    sum_h = sum(h for h, _ in level_shapes)
    level_padded = [True] * len(features)
    if per_level and no_pad:
        # zero-copy: each level is handed to the kernel as its own ref via
        # a pure reshape (contiguous merge, no data movement). The patch
        # DMA window is CLAMPED into the unpadded extent instead of
        # relying on pad rows/cols: the clamp shifts the window start and
        # the one-hot sample weights shift with it (bit-identical output —
        # reads past the needed rows land on zero-weight in-bounds rows,
        # and the kernel clamps band reads to the window's last row).
        # Levels too small to host a full window keep the padded form.
        flat2d = []
        for i, f in enumerate(features):
            Hl, Wl = f.shape[1], f.shape[2]
            if Wl < tile or B * Hl < row_pad:
                flat2d.append(
                    jnp.pad(f, ((0, 0), (0, row_pad), (0, tile), (0, 0)))
                    .reshape(B * (Hl + row_pad), Wl + tile, C)
                )
            else:
                flat2d.append(f.reshape(B * Hl, Wl, C))
                level_padded[i] = False
    elif per_level:
        # no flat2d: each level is padded by (row_pad, tile) per image and
        # handed to the kernel as its own ref. Padding BEFORE the 4D
        # retile lets XLA fuse the pad into the relayout read — one pass
        # over the pyramid instead of the three the concat form costs.
        flat2d = [
            jnp.pad(
                f, ((0, 0), (0, row_pad), (0, tile), (0, 0))
            ).reshape(B * (f.shape[1] + row_pad), f.shape[2] + tile, C)
            for f in features
        ]
    else:
        padded = [
            jnp.pad(f, ((0, 0), (0, 0), (0, W0 - f.shape[2]), (0, 0)))
            for f in features
        ]
        flat2d = jnp.concatenate(padded, axis=1).reshape(B * sum_h, W0, C)
        flat2d = jnp.pad(flat2d, ((0, row_pad), (0, tile), (0, 0)))

    row_offsets = [0]
    for h, _ in level_shapes[:-1]:
        row_offsets.append(row_offsets[-1] + h)
    level_row_offsets = jnp.array(row_offsets, jnp.int32)
    heights = jnp.array([h for h, _ in level_shapes], jnp.float32)
    widths = jnp.array([w for _, w in level_shapes], jnp.float32)
    scales = jnp.array([1.0 / s for s in strides], jnp.float32)

    all_boxes = boxes.reshape(B * R, 4)
    n = B * R
    img_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)

    if len(level_shapes) > 1:
        levels = assign_boxes_to_levels(
            all_boxes, min_level, min_level + len(level_shapes) - 1,
            canonical_box_size, canonical_level,
        )
        budget = float(tile - 4)
        max_side = jnp.maximum(
            all_boxes[:, 2] - all_boxes[:, 0], all_boxes[:, 3] - all_boxes[:, 1]
        )
        fp = max_side / jnp.asarray(
            [float(s) for s in strides], jnp.float32
        )[levels]
        need = jnp.ceil(jnp.log2(jnp.maximum(fp / budget, 1.0))).astype(jnp.int32)
        levels = jnp.minimum(levels + need, len(level_shapes) - 1)
    else:
        levels = jnp.zeros((n,), jnp.int32)

    scale = scales[levels]
    h_l = heights[levels]
    w_l = widths[levels]
    if per_level:
        # level-local rows: image b's rows live at [b*(H_l+row_pad), ...)
        # (or [b*H_l, ...) for no_pad levels)
        heights_padded = jnp.array(
            [
                h + row_pad if level_padded[i] else h
                for i, (h, _) in enumerate(level_shapes)
            ],
            jnp.int32,
        )
        row_off = img_idx * heights_padded[levels]
    else:
        row_off = level_row_offsets[levels] + img_idx * sum_h

    x0 = all_boxes[:, 0] * scale - 0.5
    y0 = all_boxes[:, 1] * scale - 0.5
    x1 = jnp.maximum(all_boxes[:, 2] * scale - 0.5, x0)
    y1 = jnp.maximum(all_boxes[:, 3] * scale - 0.5, y0)
    bin_w = (x1 - x0) / P
    bin_h = (y1 - y0) / P

    if sampling_ratio > 0:
        grid_w = jnp.full_like(bin_w, G)
        grid_h = jnp.full_like(bin_h, G)
    else:
        grid_w = jnp.clip(jnp.ceil(bin_w), 1, G)
        grid_h = jnp.clip(jnp.ceil(bin_h), 1, G)
    count = jnp.maximum(grid_h * grid_w, 1.0)

    p_ar = jnp.arange(P, dtype=jnp.float32)
    g_ar = jnp.arange(G, dtype=jnp.float32)

    def axis_samples(o0, bin_sz, grid):
        pos = (
            o0[:, None, None]
            + p_ar[None, :, None] * bin_sz[:, None, None]
            + (g_ar[None, None, :] + 0.5) * bin_sz[:, None, None] / grid[:, None, None]
        )
        valid = g_ar[None, None, :] < grid[:, None, None]
        return pos, valid

    xs, x_valid = axis_samples(x0, bin_w, grid_w)
    ys, y_valid = axis_samples(y0, bin_h, grid_h)

    def corners(v, size):
        inside = (v >= -1.0) & (v <= size[:, None, None])
        v = jnp.maximum(v, 0.0)
        low = jnp.floor(v).astype(jnp.int32)
        sz = size.astype(jnp.int32)
        capped = low >= sz[:, None, None] - 1
        low = jnp.where(capped, sz[:, None, None] - 1, low)
        frac = jnp.where(capped, 0.0, v - low)
        return low, frac, inside

    x_low, lx, x_inside = corners(xs, w_l)
    y_low, ly, y_inside = corners(ys, h_l)

    x_start = x_low[:, 0, 0]
    if no_pad:
        # clamp the window into the (possibly unpadded) level extent; the
        # one-hot weights shift with the clamped start — bit-identical
        # output. Slot `tile` is dropped by the one-hot compare below
        # (capped samples carry zero wx1), so t_low may reach tile-1.
        w_eff = jnp.array([f.shape[1] for f in flat2d], jnp.int32)
        x_start = jnp.clip(x_start, 0, w_eff[levels] - tile)
        t_cap = tile - 1
    else:
        t_cap = tile - 2
    t_low = jnp.clip(x_low - x_start[:, None, None], 0, t_cap)
    wx0 = jnp.where(x_inside & x_valid, (1.0 - lx), 0.0)
    wx1 = jnp.where(x_inside & x_valid, lx, 0.0)
    t_iota = jnp.arange(tile, dtype=jnp.int32)
    q = P * G
    t_low_f = t_low.reshape(n, q)
    Wx = (
        wx0.reshape(n, q)[..., None] * (t_iota[None, None, :] == t_low_f[..., None])
        + wx1.reshape(n, q)[..., None]
        * (t_iota[None, None, :] == (t_low_f + 1)[..., None])
    ).astype(dtype)

    # 4-row band per output row: starts at the gy=0 corner row; one-hot
    # scatter of the 2G corner weights over the 4 band slots
    band0 = y_low[:, :, 0]  # (n, P)
    d = jnp.clip(y_low - band0[:, :, None], 0, 2)  # (n, P, G) in [0, 2]
    wy0 = jnp.where(y_inside & y_valid, 1.0 - ly, 0.0)  # weight at d
    wy1 = jnp.where(y_inside & y_valid, ly, 0.0)  # weight at d + 1
    rb_iota = jnp.arange(4, dtype=jnp.int32)
    Wy4 = (
        (wy0[..., None] * (rb_iota[None, None, None, :] == d[..., None])).sum(2)
        + (wy1[..., None] * (rb_iota[None, None, None, :] == (d + 1)[..., None])).sum(2)
    ).astype(jnp.float32)  # (n, P, 4)

    band_starts = row_off[:, None] + band0  # (n, P)
    return flat2d, band_starts, x_start.astype(jnp.int32), Wx, Wy4, count, G, dtype, levels


def _pallas_roi_kernel_band(P, G, tile, C, group, depth=2):
    """Band kernel body: one (4, tile) strided DMA per (box, output row)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c2 = C // 128

    def kernel(
        rows_ref,   # SMEM (group, P) int32 band starts
        rows_nxt,   # SMEM (group, P)
        xs_ref,     # SMEM (group, 1) int32
        xs_nxt,     # SMEM (group, 1)
        wy_ref,     # SMEM (group, P * 4) f32 band-row weights
        cnt_ref,    # SMEM (group, 1) f32
        wx_ref,     # VMEM (group, P, tile)
        flat_ref,   # ANY (rows, W0, c2, 128)
        out_ref,    # VMEM (group, P, P, C)
        tiles,      # VMEM scratch (depth, group, P, 4, tile, c2, 128)
        rows_sum,   # VMEM scratch (P, tile, c2, 128) f32
        sems,       # DMA sems (depth, group)
    ):
        i = pl.program_id(0)
        nprog = pl.num_programs(0)
        slot = jax.lax.rem(i, depth) if depth > 1 else 0
        nxt = jax.lax.rem(i + 1, depth) if depth > 1 else 0

        def dma(s, b, py, rows, xs):
            return pltpu.make_async_copy(
                flat_ref.at[pl.ds(rows[b, py], 4), pl.ds(xs[b, 0], tile)],
                tiles.at[s, b, py],
                sems.at[s, b],
            )

        if depth > 1:
            @pl.when(i == 0)
            def _():
                for b in range(group):
                    for py in range(P):
                        dma(0, b, py, rows_ref, xs_ref).start()

            @pl.when(i + 1 < nprog)
            def _():
                for b in range(group):
                    for py in range(P):
                        dma(nxt, b, py, rows_nxt, xs_nxt).start()
        else:
            for b in range(group):
                for py in range(P):
                    dma(0, b, py, rows_ref, xs_ref).start()

        for b in range(group):
            for py in range(P):
                dma(slot, b, py, rows_ref, xs_ref).wait()
            for py in range(P):
                acc = None
                for rb in range(4):
                    term = tiles[slot, b, py, rb].astype(jnp.float32) * wy_ref[
                        b, py * 4 + rb
                    ]
                    acc = term if acc is None else acc + term
                rows_sum[py] = acc
            inv = 1.0 / cnt_ref[b, 0]
            for py in range(P):
                for c in range(c2):
                    v = jax.lax.dot_general(
                        wx_ref[b],
                        rows_sum[py, :, c],
                        (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )
                    out_ref[b, py, :, c * 128 : (c + 1) * 128] = (v * inv).astype(
                        out_ref.dtype
                    )

    return kernel


def batched_multilevel_roi_align_pallas_fast(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 2,
    min_level: int | None = None,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    tile: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Serving-mode Pallas RoIAlign: P band DMAs per box at tile=32.

    ~2.5x fewer DMA descriptors and ~1.5x fewer bytes than the paired
    kernel; boxes whose footprint exceeds ``tile - 4`` on either axis pool
    one FPN level coarser than the reference rule (see _tiled_prep_band).
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R = boxes.shape[:2]
    P = output_size
    C = features[0].shape[-1]
    packing = max(1, 4 // features[0].dtype.itemsize)
    c_mult = 128 * packing
    c_pad = (-C) % c_mult
    if c_pad:
        features = [jnp.pad(f, ((0, 0),) * 3 + ((0, c_pad),)) for f in features]
    flat2d, band_starts, x_start, Wx, Wy4, count, G, dtype, _ = _tiled_prep_band(
        features, boxes, strides, output_size, sampling_ratio, max_grid,
        min_level, canonical_box_size, canonical_level, tile,
    )
    n = B * R
    C = features[0].shape[-1]
    group = 8

    WxB = Wx.reshape(n, P, G, tile).sum(axis=2).astype(jnp.float32)
    wy_flat = Wy4.reshape(n, P * 4)
    cnt = count.reshape(n, 1).astype(jnp.float32)
    xs = x_start.reshape(n, 1)

    n_pad = ((n + group - 1) // group) * group
    if n_pad != n:
        pad = n_pad - n
        band_starts = jnp.pad(band_starts, ((0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
        WxB = jnp.pad(WxB, ((0, pad), (0, 0), (0, 0)))
        wy_flat = jnp.pad(wy_flat, ((0, pad), (0, 0)))
        cnt = jnp.pad(cnt, ((0, pad), (0, 0)), constant_values=1.0)

    rows_ext = jnp.concatenate([band_starts, band_starts[-group:]], axis=0)
    xs_ext = jnp.concatenate([xs, xs[-group:]], axis=0)

    depth = 2 if jnp.dtype(dtype).itemsize <= 2 else 1
    kernel = _pallas_roi_kernel_band(P, G, tile, C, group, depth)
    W0 = flat2d.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[
            pl.BlockSpec((group, P), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, P), lambda i: (i + 1, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i + 1, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, P * 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, P, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (group, P, P, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, P, P, C), dtype, vma=out_vma(WxB, wy_flat, cnt)
        ),
        scratch_shapes=[
            pltpu.VMEM((depth, group, P, 4, tile, C // 128, 128), dtype),
            pltpu.VMEM((P, tile, C // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((depth, group)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        rows_ext, rows_ext, xs_ext, xs_ext, wy_flat, cnt, WxB,
        flat2d.reshape(flat2d.shape[0], W0, C // 128, 128),
    )
    out = out[:n].reshape(B, R, P, P, C)
    return out[..., : C - c_pad] if c_pad else out


def _pallas_roi_kernel_patch(P, G, tile, C, group, depth=2, patch_rows=32):
    """Patch kernel body: ONE (patch_rows, tile) strided DMA per box.

    Same weights and accumulation order as :func:`_pallas_roi_kernel_band`
    (bit-identical output); only the DMA pattern changes — the box's full
    row footprint (budget <= tile-4 rows, so patch_rows = tile suffices)
    arrives in one descriptor, and each output row's 4-row band is sliced
    from the VMEM patch at its (SMEM-provided) relative offset. Cuts the
    per-box descriptor count P*? -> 1 (the band kernel's issue rate was the
    measured bottleneck: 56 starts per 8-box grid step).
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c2 = C // 128
    PR = patch_rows

    def kernel(
        pr_ref,     # SMEM (group, 1) int32 absolute patch row starts
        pr_nxt,     # SMEM (group, 1)
        xs_ref,     # SMEM (group, 1) int32
        xs_nxt,     # SMEM (group, 1)
        rel_ref,    # SMEM (group, P) int32 band offsets within the patch
        wy_ref,     # SMEM (group, P * 4) f32 band-row weights
        cnt_ref,    # SMEM (group, 1) f32
        wx_ref,     # VMEM (group, P, tile)
        flat_ref,   # ANY (rows, W0, c2, 128)
        out_ref,    # VMEM (group, P, P, C)
        patches,    # VMEM scratch (depth, group, PR, tile, c2, 128)
        rows_sum,   # VMEM scratch (P, tile, c2, 128) f32
        sems,       # DMA sems (depth, group)
    ):
        i = pl.program_id(0)
        nprog = pl.num_programs(0)
        slot = jax.lax.rem(i, depth) if depth > 1 else 0
        nxt = jax.lax.rem(i + 1, depth) if depth > 1 else 0

        def dma(s, b, pr, xs):
            return pltpu.make_async_copy(
                flat_ref.at[pl.ds(pr[b, 0], PR), pl.ds(xs[b, 0], tile)],
                patches.at[s, b],
                sems.at[s, b],
            )

        if depth > 1:
            @pl.when(i == 0)
            def _():
                for b in range(group):
                    dma(0, b, pr_ref, xs_ref).start()

            @pl.when(i + 1 < nprog)
            def _():
                for b in range(group):
                    dma(nxt, b, pr_nxt, xs_nxt).start()
        else:
            for b in range(group):
                dma(0, b, pr_ref, xs_ref).start()

        for b in range(group):
            dma(slot, b, pr_ref, xs_ref).wait()
            for py in range(P):
                off = rel_ref[b, py]
                acc = None
                for rb in range(4):
                    term = patches[slot, b, off + rb].astype(jnp.float32) * wy_ref[
                        b, py * 4 + rb
                    ]
                    acc = term if acc is None else acc + term
                rows_sum[py] = acc
            inv = 1.0 / cnt_ref[b, 0]
            for py in range(P):
                for c in range(c2):
                    v = jax.lax.dot_general(
                        wx_ref[b],
                        rows_sum[py, :, c],
                        (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )
                    out_ref[b, py, :, c * 128 : (c + 1) * 128] = (v * inv).astype(
                        out_ref.dtype
                    )

    return kernel


def batched_multilevel_roi_align_pallas_patch(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 2,
    min_level: int | None = None,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    tile: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Serving-mode Pallas RoIAlign: one (tile, tile) patch DMA per box.

    Level-assignment semantics identical to
    :func:`batched_multilevel_roi_align_pallas_fast` (footprint budget
    ``tile - 4`` on both axes, large boxes pool one level coarser); output
    bit-identical to the band kernel (same weights, same accumulation
    order). ~14% more bytes per box but 28x fewer DMA descriptors.

    Requires the multi-level budget (the patch window holds a box's whole
    row footprint only after the level bump caps it at ``tile - 4``);
    single-level inputs fall back to the band kernel.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if len(features) == 1:
        return batched_multilevel_roi_align_pallas_fast(
            features, boxes, strides, output_size, sampling_ratio, max_grid,
            min_level, canonical_box_size, canonical_level, tile, interpret,
        )
    B, R = boxes.shape[:2]
    P = output_size
    C = features[0].shape[-1]
    packing = max(1, 4 // features[0].dtype.itemsize)
    c_mult = 128 * packing
    c_pad = (-C) % c_mult
    if c_pad:
        features = [jnp.pad(f, ((0, 0),) * 3 + ((0, c_pad),)) for f in features]
    PR = tile
    flat2d, band_starts, x_start, Wx, Wy4, count, G, dtype, _ = _tiled_prep_band(
        features, boxes, strides, output_size, sampling_ratio, max_grid,
        min_level, canonical_box_size, canonical_level, tile,
        row_pad=PR,
    )
    n = B * R
    C = features[0].shape[-1]

    WxB = Wx.reshape(n, P, G, tile).sum(axis=2).astype(jnp.float32)
    wy_flat = Wy4.reshape(n, P * 4)
    cnt = count.reshape(n, 1).astype(jnp.float32)
    xs = x_start.reshape(n, 1)
    patch0 = band_starts[:, :1]  # (n, 1) absolute first band row
    # per-output-row band offset within the patch; the footprint budget
    # guarantees band_starts[py] - band_starts[0] + 4 <= tile
    rel = (band_starts - patch0).astype(jnp.int32)

    itemsize = jnp.dtype(dtype).itemsize
    depth = 2 if itemsize <= 2 else 1
    group = 8
    budget = 12 * 1024 * 1024

    def scratch_bytes(g, d):
        return (
            d * g * PR * tile * C * itemsize
            + P * tile * C * 4
            + g * P * P * C * itemsize
        )

    while group > 1 and scratch_bytes(group, depth) > budget:
        group //= 2
    if depth == 2 and scratch_bytes(group, depth) > budget:
        depth = 1

    n_pad = ((n + group - 1) // group) * group
    if n_pad != n:
        pad = n_pad - n
        patch0 = jnp.pad(patch0, ((0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
        rel = jnp.pad(rel, ((0, pad), (0, 0)))
        WxB = jnp.pad(WxB, ((0, pad), (0, 0), (0, 0)))
        wy_flat = jnp.pad(wy_flat, ((0, pad), (0, 0)))
        cnt = jnp.pad(cnt, ((0, pad), (0, 0)), constant_values=1.0)

    pr_ext = jnp.concatenate([patch0, patch0[-group:]], axis=0)
    xs_ext = jnp.concatenate([xs, xs[-group:]], axis=0)

    kernel = _pallas_roi_kernel_patch(P, G, tile, C, group, depth, PR)
    W0 = flat2d.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i + 1, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i + 1, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, P), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, P * 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, P, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (group, P, P, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, P, P, C), dtype, vma=out_vma(WxB, wy_flat, cnt)
        ),
        scratch_shapes=[
            pltpu.VMEM((depth, group, PR, tile, C // 128, 128), dtype),
            pltpu.VMEM((P, tile, C // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((depth, group)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        pr_ext, pr_ext, xs_ext, xs_ext, rel, wy_flat, cnt, WxB,
        flat2d.reshape(flat2d.shape[0], W0, C // 128, 128),
    )
    out = out[:n].reshape(B, R, P, P, C)
    return out[..., : C - c_pad] if c_pad else out


def _pallas_roi_kernel_patch_ml(P, G, tile, C, group, depth, patch_rows, L,
                                compute="full", dot_impl="fp32"):
    """Multi-ref patch kernel: per-level feature refs, the box's level (an
    SMEM scalar) predicates which ref the single patch DMA reads.

    Same math as :func:`_pallas_roi_kernel_patch`; with one DMA start per
    box the L-way ``pl.when`` costs ~L scalar compares per box instead of
    the band kernel's per-band fan-out. This removes the flat2d staging
    entirely (measured 14.2 ms/batch of concat/pad/retile at bs16 R-101) —
    each level arrives as its own (rows, W_l, C/128, 128) ref. The 4D
    split is a Mosaic requirement, not a choice: the two dynamically
    sliced dims (rows, x) must be untiled, so the lane/sublane tiles must
    live on trailing static dims (a 3D (rows, W, C) ref fails memref_slice
    on the tiled W dim). XLA pays a T(2,128) retile pass per level for
    this on top of the layout copy — measured 2.2 + 1.7 ms for p2 at bs16
    R-101; a fused single-pass relayout is the remaining known headroom.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c2 = C // 128
    PR = patch_rows
    # NOTE (round 5): footprint-chunked patch reads — the big win on the
    # TRAIN backward (0.33x bytes) — were tried HERE too and measured
    # SLOWER on chip both ways: 16x16 chunks 143.5 img/s, 16-row-only
    # chunks 146.2, vs 148.1 for the single whole-patch DMA. Serving
    # boxes are post-NMS real objects with near-window footprints, so the
    # byte savings are small while the extra predicated descriptors hit
    # the scalar-core issue rate — the very bottleneck the one-DMA patch
    # form exists to avoid. Do not re-try without changing the trade.

    def kernel(*args):
        (pr_ref, pr_nxt, xs_ref, xs_nxt, lvl_ref, lvl_nxt, rel_ref, wy_ref,
         cnt_ref, wx_ref) = args[:10]
        flat_refs = args[10 : 10 + L]
        out_ref = args[10 + L]
        rest = args[11 + L :]
        patches, rows_sum, sems = rest[:3]
        pf32 = rest[3] if compute == "hoist" else None
        rs2 = rest[3] if compute in ("fused", "groupdot") else None

        i = pl.program_id(0)
        nprog = pl.num_programs(0)
        slot = jax.lax.rem(i, depth) if depth > 1 else 0
        nxt = jax.lax.rem(i + 1, depth) if depth > 1 else 0

        def dma(k, s, b, pr, xs):
            return pltpu.make_async_copy(
                flat_refs[k].at[pl.ds(pr[b, 0], PR), pl.ds(xs[b, 0], tile)],
                patches.at[s, b],
                sems.at[s, b],
            )

        def start(s, b, pr, xs, lvl):
            for k in range(L):
                @pl.when(lvl[b, 0] == k)
                def _():
                    dma(k, s, b, pr, xs).start()

        if compute == "nodma":
            # measurement-only: DMA+wait only on the first grid step; all
            # later steps compute from stale slot-0 patches -> pure compute
            # rate (results are garbage)
            @pl.when(i == 0)
            def _():
                for b in range(group):
                    start(0, b, pr_ref, xs_ref, lvl_ref)
                for b in range(group):
                    dma(0, 0, b, pr_ref, xs_ref).wait()
        elif depth > 1:
            @pl.when(i == 0)
            def _():
                for b in range(group):
                    start(0, b, pr_ref, xs_ref, lvl_ref)

            @pl.when(i + 1 < nprog)
            def _():
                for b in range(group):
                    start(nxt, b, pr_nxt, xs_nxt, lvl_nxt)
        else:
            for b in range(group):
                start(0, b, pr_ref, xs_ref, lvl_ref)

        if compute == "stub":
            # measurement-only mode (scripts/bench_pool_serving.py): same
            # DMA traffic, near-zero compute — establishes the kernel's
            # DMA floor so the full-compute gap is attributable
            for b in range(group):
                dma(0, slot, b, pr_ref, xs_ref).wait()
                for py in range(P):
                    out_ref[b, py] = (
                        patches[slot, b, py][:P].reshape(P, C).astype(out_ref.dtype)
                    )
            return

        if compute == "groupdot":
            # band-combine all `group` boxes into a stacked (group*tile,
            # P*C) scratch, then ONE block-diagonal MXU dot per grid step:
            # (group*P, group*tile) @ (group*tile, P*C). The zero blocks
            # contribute exact +0.0 adds, so every output element sees the
            # same K=32 nonzero accumulation as the per-box dot ->
            # bit-identical, at ~1/4 the MXU tile-pass count.
            for b in range(group):
                dma(0, slot, b, pr_ref, xs_ref).wait()
                for py in range(P):
                    off = rel_ref[b, py]
                    acc = None
                    for rb in range(4):
                        row = jnp.minimum(off + rb, PR - 1)
                        term = patches[slot, b, row].astype(
                            jnp.float32
                        ) * wy_ref[b, py * 4 + rb]
                        acc = term if acc is None else acc + term
                    for c2 in range(C // 128):
                        j = (py * (C // 128) + c2) * 128
                        rs2[b * tile : (b + 1) * tile, j : j + 128] = acc[:, c2]
            v = jax.lax.dot_general(
                wx_ref[0],
                rs2[...],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            for b in range(group):
                inv = 1.0 / cnt_ref[b, 0]
                for py in range(P):
                    out_ref[b, py] = (
                        v[b * P : (b + 1) * P, py * C : (py + 1) * C] * inv
                    ).astype(out_ref.dtype)
            return

        for b in range(group):
            # all refs share the slice shape/dtype, so a descriptor built on
            # ref 0 (the largest level) waits for the right byte count
            # whichever ref the start used
            if compute == "nodma":
                slot = 0
            else:
                dma(0, slot, b, pr_ref, xs_ref).wait()
            if compute == "hoist":
                # convert the whole patch to f32 ONCE (256 vreg converts),
                # then pure f32 FMAs in the band combine — vs the default's
                # per-term convert+mul+add (28 x 3 x 8 vreg ops)
                pf32[...] = patches[slot, b].astype(jnp.float32)
            src = pf32 if compute == "hoist" else None
            for py in range(P):
                off = rel_ref[b, py]
                acc = None
                for rb in range(4):
                    # bottom-edge boxes at clamped windows can point band
                    # slots past PR-1; those slots carry zero weight
                    # (capped y_low has frac 0) — clamp the read in-bounds
                    row = jnp.minimum(off + rb, PR - 1)
                    if src is not None:
                        term = src[row] * wy_ref[b, py * 4 + rb]
                    else:
                        term = patches[slot, b, row].astype(
                            jnp.float32
                        ) * wy_ref[b, py * 4 + rb]
                    acc = term if acc is None else acc + term
                if compute == "fused":
                    # stage py's band-combined rows into the lane-blocked
                    # (tile, P*C) scratch at static 128-lane offsets — a
                    # pure slice copy (no (C2,128)->C relayout), enabling
                    # ONE MXU dot per box below
                    for c2 in range(C // 128):
                        j = (py * (C // 128) + c2) * 128
                        rs2[:, j : j + 128] = acc[:, c2]
                else:
                    rows_sum[py] = acc
            inv = 1.0 / cnt_ref[b, 0]
            if compute == "fused":
                # one (P, tile) @ (tile, P*C) dot per box replaces the 7
                # per-py dots: same K=32 contraction (bit-identical per
                # element) but one issue + one operand pad, amortizing
                # Mosaic's small-matmul overhead 7x
                v = jax.lax.dot_general(
                    wx_ref[b],
                    rs2[...],
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                for py in range(P):
                    out_ref[b, py] = (
                        v[:, py * C : (py + 1) * C] * inv
                    ).astype(out_ref.dtype)
                continue
            if compute == "nodot":
                # measurement-only: band combine without the MXU dots —
                # splits the compute budget between VPU and MXU phases
                for py in range(P):
                    out_ref[b, py] = (
                        rows_sum[py][:P].reshape(P, C) * inv
                    ).astype(out_ref.dtype)
                continue
            for py in range(P):
                # full-C contraction in one dot per (box, output row);
                # identical sums to the per-128-lane form (the contraction
                # dim is unchanged), half the dot/write op count. A
                # one-dot-per-BOX x-major variant was tried (round 4) and
                # measured NEUTRAL on chip while breaking bit-identity
                # with the band kernel (different dot blocking rounds
                # 1 ulp apart). Round-5 microbench (bench_pool_serving.py):
                # the kernel is DOT-bound — HIGHEST on f32 inputs is 6-pass
                # bf16 emulation and the dots alone cost ~12 ms at bs16,
                # while the VPU band combine hides entirely under the DMA.
                r = rows_sum[py].reshape(tile, C)
                if dot_impl == "bf16x3":
                    # split-precision x-combine (POOLER_DOT bf16x3 serving
                    # mode): both operands split into exact bf16 hi + lo
                    # remainders, three 1-pass bf16 MXU dots (the lo*lo
                    # term ~2^-34 is dropped) -> ~2^-15 relative error vs
                    # the exact-f32 dot, at half the MXU passes of the
                    # 6-pass HIGHEST emulation. wx hi/lo come presplit
                    # from the prep.
                    r_hi = r.astype(jnp.bfloat16)
                    r_lo = (r - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    dims = (((1,), (0,)), ((), ()))
                    v = (
                        jax.lax.dot_general(
                            wx_ref[b, 0], r_hi, dims,
                            preferred_element_type=jnp.float32,
                        )
                        + jax.lax.dot_general(
                            wx_ref[b, 0], r_lo, dims,
                            preferred_element_type=jnp.float32,
                        )
                        + jax.lax.dot_general(
                            wx_ref[b, 1], r_hi, dims,
                            preferred_element_type=jnp.float32,
                        )
                    )
                else:
                    prec = {
                        "high": jax.lax.Precision.HIGH,
                        "dotdef": jax.lax.Precision.DEFAULT,
                    }.get(compute, jax.lax.Precision.HIGHEST)
                    v = jax.lax.dot_general(
                        wx_ref[b],
                        r,
                        (((1,), (0,)), ((), ())),
                        precision=prec,
                        preferred_element_type=jnp.float32,
                    )
                out_ref[b, py] = (v * inv).astype(out_ref.dtype)

    return kernel


def batched_multilevel_roi_align_pallas_patch_ml(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 2,
    min_level: int | None = None,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    tile: int = 32,
    interpret: bool = False,
    _compute: str = "full",
    dot_impl: str = "fp32",
) -> jnp.ndarray:
    """Stage-free serving RoIAlign: per-level refs + one patch DMA per box.

    Numerically identical to :func:`batched_multilevel_roi_align_pallas_fast`
    (same weights and accumulation order; the footprint budget and
    level-bump rule are shared via _tiled_prep_band). The difference is
    pure data movement: no flat2d concat — each FPN level is handed to the
    kernel as its own HBM ref after one fused pad+relayout pass.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if len(features) == 1:
        # single level has no level-bump budget, so a box's row footprint
        # can exceed the patch window; the band kernel handles any size
        return batched_multilevel_roi_align_pallas_fast(
            features, boxes, strides, output_size, sampling_ratio, max_grid,
            min_level, canonical_box_size, canonical_level, tile, interpret,
        )
    B, R = boxes.shape[:2]
    P = output_size
    C = features[0].shape[-1]
    packing = max(1, 4 // features[0].dtype.itemsize)
    c_mult = 128 * packing
    c_pad = (-C) % c_mult
    if c_pad:
        features = [jnp.pad(f, ((0, 0),) * 3 + ((0, c_pad),)) for f in features]
    PR = tile
    flats, band_starts, x_start, Wx, Wy4, count, G, dtype, levels = (
        _tiled_prep_band(
            features, boxes, strides, output_size, sampling_ratio, max_grid,
            min_level, canonical_box_size, canonical_level, tile,
            row_pad=PR, per_level=True, no_pad=True,
        )
    )
    n = B * R
    C = features[0].shape[-1]
    L = len(flats)

    WxB = Wx.reshape(n, P, G, tile).sum(axis=2).astype(jnp.float32)
    wy_flat = Wy4.reshape(n, P * 4)
    cnt = count.reshape(n, 1).astype(jnp.float32)
    xs = x_start.reshape(n, 1)
    # clamp the row window into each level's extent (no_pad refs carry no
    # bottom pad); rel then reaches up to PR-1 for bottom-edge boxes and
    # the kernel clamps band reads to the window's last row (those reads
    # carry zero weight — corners() caps y_low with frac 0)
    rows_total = jnp.array([f.shape[0] for f in flats], jnp.int32)[levels]
    patch0 = jnp.clip(band_starts[:, :1], 0, (rows_total - PR)[:, None])
    rel = (band_starts - patch0).astype(jnp.int32)
    lvl = levels.reshape(n, 1).astype(jnp.int32)

    itemsize = jnp.dtype(dtype).itemsize
    depth = 2 if itemsize <= 2 else 1
    # the 12 MB budget is NOT conservative: XLA's scoped-vmem limit for a
    # kernel is 16 MB (group 16 / 24 MB was tried round 4 and fails AOT
    # with "Scoped allocation 16.22M, limit 16.00M"; the raise flag is
    # rejected by this client). group 8 / depth 2 is the ceiling here.
    group = 8
    budget = 12 * 1024 * 1024

    def scratch_bytes(g, d):
        extra = PR * tile * C * 4 if _compute == "hoist" else 0
        if _compute == "fused":
            extra = tile * P * C * 4
        elif _compute == "groupdot":
            extra = g * tile * P * C * 4
        return (
            d * g * PR * tile * C * itemsize
            + P * tile * C * 4
            + g * P * P * C * itemsize
            + extra
        )

    while group > 1 and scratch_bytes(group, depth) > budget:
        group //= 2
    if depth == 2 and scratch_bytes(group, depth) > budget:
        depth = 1

    n_pad = ((n + group - 1) // group) * group
    if n_pad != n:
        pad = n_pad - n
        patch0 = jnp.pad(patch0, ((0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
        rel = jnp.pad(rel, ((0, pad), (0, 0)))
        lvl = jnp.pad(lvl, ((0, pad), (0, 0)))
        WxB = jnp.pad(WxB, ((0, pad), (0, 0), (0, 0)))
        wy_flat = jnp.pad(wy_flat, ((0, pad), (0, 0)))
        cnt = jnp.pad(cnt, ((0, pad), (0, 0)), constant_values=1.0)

    pr_ext = jnp.concatenate([patch0, patch0[-group:]], axis=0)
    xs_ext = jnp.concatenate([xs, xs[-group:]], axis=0)
    lvl_ext = jnp.concatenate([lvl, lvl[-group:]], axis=0)

    kernel = _pallas_roi_kernel_patch_ml(
        P, G, tile, C, group, depth, PR, L, compute=_compute, dot_impl=dot_impl
    )
    # 4D refs: Mosaic requires the dynamically sliced dims untiled (see
    # kernel docstring) — XLA materializes a T(2,128) retile per level
    flat_args = [f.reshape(f.shape[0], f.shape[1], C // 128, 128) for f in flats]
    if _compute == "groupdot":
        # block-diagonal x-weights for the one-dot-per-group form:
        # lhs[b*P+px, b*tile+x] = WxB[b, px, x], zeros elsewhere
        g8 = n_pad // group
        Wr = WxB.reshape(g8, group, P, tile)
        eye = jnp.eye(group, dtype=WxB.dtype)
        wx_arg = (
            Wr[:, :, :, None, :] * eye[None, :, None, :, None]
        ).reshape(g8, group * P, group * tile)
        wx_spec = pl.BlockSpec(
            (1, group * P, group * tile), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    elif dot_impl == "bf16x3":
        # exact bf16 hi/lo split of the x-weights, stacked on a new axis:
        # wx_ref[b, 0] = hi, wx_ref[b, 1] = lo
        wx_hi = WxB.astype(jnp.bfloat16)
        wx_lo = (WxB - wx_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        wx_arg = jnp.stack([wx_hi, wx_lo], axis=1)
        wx_spec = pl.BlockSpec(
            (group, 2, P, tile), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        wx_arg = WxB
        wx_spec = pl.BlockSpec(
            (group, P, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
    smem1 = lambda: pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM)
    smem1n = lambda: pl.BlockSpec(
        (group, 1), lambda i: (i + 1, 0), memory_space=pltpu.SMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[
            smem1(), smem1n(), smem1(), smem1n(), smem1(), smem1n(),
            pl.BlockSpec((group, P), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, P * 4), lambda i: (i, 0), memory_space=pltpu.SMEM),
            smem1(),
            wx_spec,
        ] + [pl.BlockSpec(memory_space=pltpu.ANY)] * L,
        out_specs=pl.BlockSpec(
            (group, P, P, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, P, P, C), dtype, vma=out_vma(WxB, wy_flat, cnt)
        ),
        scratch_shapes=[
            pltpu.VMEM((depth, group, PR, tile, C // 128, 128), dtype),
            pltpu.VMEM((P, tile, C // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((depth, group)),
        ] + (
            [pltpu.VMEM((PR, tile, C // 128, 128), jnp.float32)]
            if _compute == "hoist" else []
        ) + (
            [pltpu.VMEM((tile, P * C), jnp.float32)]
            if _compute == "fused" else []
        ) + (
            [pltpu.VMEM((group * tile, P * C), jnp.float32)]
            if _compute == "groupdot" else []
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        pr_ext, pr_ext, xs_ext, xs_ext, lvl_ext, lvl_ext, rel, wy_flat, cnt,
        wx_arg, *flat_args,
    )
    out = out[:n].reshape(B, R, P, P, C)
    return out[..., : C - c_pad] if c_pad else out


# ---------------------------------------------------------------------------
# Trainable Pallas RoIAlign: paired-DMA forward + sequential patch-RMW
# backward (custom VJP).
# ---------------------------------------------------------------------------


def _pallas_roi_backward_kernel(P, G, tile, C, rows_cap, group):
    """Backward kernel body: ``group`` boxes per grid step, each processed
    strictly sequentially (the TPU grid is sequential and the in-step loop
    serializes, making read-modify-write of overlapping box patches
    race-free). Per box: read its (rows_cap, tile) feature-grad patch, add
    the bilinear-weighted output-grad contributions, write it back."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c2 = C // 128
    q = P * G

    def kernel(
        patch0_ref,  # SMEM (group, 1) int32 — patch row starts
        rowoff_ref,  # SMEM (group, q) int32 — pair offsets within patch
        xs_ref,      # SMEM (group, 1) int32 — x window starts
        wy_ref,      # SMEM (group, 2 * q) f32
        cnt_ref,     # SMEM (group, 1) f32
        wx_ref,      # VMEM (group, P, tile) f32 (gx-summed x weights)
        gout_ref,    # VMEM (group, P, P, C) — output grads
        dflat_in,    # ANY (rows, W0, c2, 128) f32 — accumulator (aliased)
        dflat_ref,   # ANY — the same buffer as the kernel output
        patch,       # VMEM scratch (rows_cap, tile, c2, 128) f32
        drows,       # VMEM scratch (P, tile, c2, 128) f32
        sems,        # DMA sems (2,)
    ):
        del dflat_in  # same memory as dflat_ref via input_output_aliases

        for b in range(group):
            read = pltpu.make_async_copy(
                dflat_ref.at[
                    pl.ds(patch0_ref[b, 0], rows_cap), pl.ds(xs_ref[b, 0], tile)
                ],
                patch,
                sems.at[0],
            )
            read.start()

            # drows[py, t, c] = inv * sum_px WxB[px, t] * gout[py, px, c]
            inv = 1.0 / cnt_ref[b, 0]
            for py in range(P):
                for c in range(c2):
                    v = jax.lax.dot_general(
                        wx_ref[b],  # (P(px), tile)
                        gout_ref[b, py, :, c * 128 : (c + 1) * 128].astype(
                            jnp.float32
                        ),
                        (((0,), (0,)), ((), ())),  # contract px
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )  # (tile, 128)
                    drows[py, :, c] = v * inv

            read.wait()
            # accumulate the 2-row corner pairs into the patch
            for r in range(q):
                py = r // G
                o = rowoff_ref[b, r]
                pair = patch[pl.ds(o, 2)]
                add0 = drows[py] * wy_ref[b, 2 * r]
                add1 = drows[py] * wy_ref[b, 2 * r + 1]
                patch[pl.ds(o, 2)] = pair + jnp.stack([add0, add1])

            write = pltpu.make_async_copy(
                patch,
                dflat_ref.at[
                    pl.ds(patch0_ref[b, 0], rows_cap), pl.ds(xs_ref[b, 0], tile)
                ],
                sems.at[1],
            )
            write.start()
            # overlapping patches: the next box's read must observe this
            # write — strict serialization
            write.wait()

    return kernel


def _roi_align_paired_bwd_impl(
    features, boxes, strides, output_size, sampling_ratio, max_grid,
    min_level, canonical_box_size, canonical_level, tile, gout, interpret=False,
):
    """d(pooled)/d(features) via the sequential patch-RMW kernel. Returns
    per-level feature grads (f32)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R = boxes.shape[:2]
    P = output_size
    C0 = features[0].shape[-1]
    packing = max(1, 4 // features[0].dtype.itemsize)
    c_mult = 128 * packing
    c_pad = (-C0) % c_mult
    if c_pad:
        features = [jnp.pad(f, ((0, 0),) * 3 + ((0, c_pad),)) for f in features]
    flat2d, row_starts, x_start, Wx, wy, count, G, dtype = _tiled_prep_2d(
        features, boxes, strides, output_size, sampling_ratio, max_grid,
        min_level, canonical_box_size, canonical_level, tile,
    )
    n = B * R
    C = features[0].shape[-1]
    q = P * G
    rows_cap = tile  # level bump bounds the row footprint by tile-4 (+2 corners)

    WxB = Wx.reshape(n, P, G, tile).sum(axis=2).astype(jnp.float32)
    wy_flat = wy.reshape(n, 2 * q)
    cnt = count.reshape(n, 1).astype(jnp.float32)
    xs = x_start.reshape(n, 1)
    # patch start: min corner row; pad the accumulator so a full rows_cap
    # window always fits, and clamp so the window stays in-buffer
    total_rows = max(flat2d.shape[0], rows_cap)
    patch0 = jnp.min(row_starts, axis=1)
    patch0 = jnp.clip(patch0, 0, total_rows - rows_cap).astype(jnp.int32)
    rowoff = (row_starts - patch0[:, None]).astype(jnp.int32)  # in [0, rows_cap-2]

    # gout carries the UNPADDED channel count (the forward returns C0
    # channels); pad to the lane-aligned width to mirror the features
    gout_flat = gout.reshape(n, P, P, C0).astype(jnp.float32)
    if c_pad:
        gout_flat = jnp.pad(gout_flat, ((0, 0), (0, 0), (0, 0), (0, c_pad)))

    level_shapes = [f.shape[1:3] for f in features]
    sum_h = sum(h for h, _ in level_shapes)
    # full padded prep width (incl. the +tile x-overfetch pad) so edge
    # windows land in real buffer, not clamped
    zeros = jnp.zeros((total_rows, flat2d.shape[1], C // 128, 128), jnp.float32)

    group = 8  # SMEM block sublane must be a multiple of 8
    n_pad = ((n + group - 1) // group) * group
    patch0_a = patch0.reshape(n, 1)
    if n_pad != n:
        pad = n_pad - n
        patch0_a = jnp.pad(patch0_a, ((0, pad), (0, 0)))
        rowoff = jnp.pad(rowoff, ((0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
        # padded boxes carry zero weights -> their RMW is a no-op
        wy_flat = jnp.pad(wy_flat, ((0, pad), (0, 0)))
        cnt = jnp.pad(cnt, ((0, pad), (0, 0)), constant_values=1.0)
        WxB = jnp.pad(WxB, ((0, pad), (0, 0), (0, 0)))
        gout_flat = jnp.pad(gout_flat, ((0, pad), (0, 0), (0, 0), (0, 0)))

    kernel = _pallas_roi_backward_kernel(P, G, tile, C, rows_cap, group)
    dflat = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, q), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 2 * q), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((group, P, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (group, P, P, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(
            zeros.shape, jnp.float32, vma=out_vma(gout_flat, WxB, zeros)
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_cap, tile, C // 128, 128), jnp.float32),
            pltpu.VMEM((P, tile, C // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        input_output_aliases={7: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        patch0_a, rowoff, xs, wy_flat, cnt, WxB, gout_flat, zeros
    )

    # un-stack the common-width plane back into per-level feature grads
    Wpad = flat2d.shape[1]
    dflat = dflat.reshape(total_rows, Wpad, C)[: B * sum_h]
    dflat = dflat.reshape(B, sum_h, Wpad, C)
    grads = []
    r0 = 0
    for (h, w) in level_shapes:
        g = dflat[:, r0 : r0 + h, :w, :]
        grads.append(g[..., :C0] if c_pad else g)
        r0 += h
    return tuple(grads)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9),
)
def batched_multilevel_roi_align_pallas_trainable(
    features: Tuple[jnp.ndarray, ...],
    boxes: jnp.ndarray,
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 2,
    min_level: int | None = None,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    tile: int = 48,
) -> jnp.ndarray:
    """Differentiable Pallas RoIAlign for the training path.

    Forward = the paired-DMA kernel; backward = a sequential per-box
    patch read-modify-write scatter kernel (~6x the XLA chunked
    gather+scatter pair on v5e). Box gradients are zero, matching the
    reference's detached proposals (fast_rcnn.py:188-190 asserts
    proposals require no grad).
    """
    return batched_multilevel_roi_align_pallas_paired(
        list(features), boxes, strides, output_size, sampling_ratio,
        max_grid, min_level, canonical_box_size, canonical_level, tile,
    )


def _roi_trainable_fwd(
    features, boxes, strides, output_size, sampling_ratio, max_grid,
    min_level, canonical_box_size, canonical_level, tile,
):
    out = batched_multilevel_roi_align_pallas_paired(
        list(features), boxes, strides, output_size, sampling_ratio,
        max_grid, min_level, canonical_box_size, canonical_level, tile,
    )
    return out, (features, boxes)


def _roi_trainable_bwd(
    strides, output_size, sampling_ratio, max_grid, min_level,
    canonical_box_size, canonical_level, tile, residuals, gout,
):
    features, boxes = residuals
    grads = _roi_align_paired_bwd_impl(
        list(features), boxes, strides, output_size, sampling_ratio,
        max_grid, min_level, canonical_box_size, canonical_level, tile, gout,
    )
    grads = tuple(g.astype(f.dtype) for g, f in zip(grads, features))
    return grads, jnp.zeros_like(boxes)


batched_multilevel_roi_align_pallas_trainable.defvjp(
    _roi_trainable_fwd, _roi_trainable_bwd
)


# ---------------------------------------------------------------------------
# Stage-free trainable Pallas RoIAlign (round 5): per-level no-copy refs for
# BOTH directions — the paired-DMA forward reads clamped windows straight out
# of each FPN level, and the backward is a conflict-predicated, pipelined
# patch-RMW scatter into per-level accumulators. Replaces the flat2d concat
# staging the round-4 train trace attributed 35.9 ms/step of layout to, and
# the strictly serialized backward (36.2 ms at 0.28x DMA SOL).
# Reference semantics: detectron2/layers/csrc/ROIAlign/ROIAlign_cuda.cu
# (atomicAdd scatter backward) — here race-freedom comes from the sequential
# TPU grid plus prep-computed window-overlap conflict bits instead of atomics.
# ---------------------------------------------------------------------------


def _tiled_prep_2d_ml(
    features, boxes, strides, output_size, sampling_ratio, max_grid,
    min_level, canonical_box_size, canonical_level, tile, win_rows,
):
    """Per-level no-copy variant of :func:`_tiled_prep_2d` (exact paired
    sampling semantics; same level-bump rule at budget ``tile - 4``).

    Each level is handed to the kernels as its own ``(B*H_l, W_l, C)`` ref
    via a pure reshape; only levels too small to host a clamped
    ``(win_rows, tile)`` window keep the padded form. Windows are CLAMPED
    into the level extent and the one-hot x weights / 2-row y pair weights
    shift with the clamp, so the output is identical to the padded form:
      - x: ``x_start`` clips to ``W_eff - tile``; a sample whose ``wx1``
        slot would fall at ``tile`` is capped (frac 0) so the slot drop is
        weightless.
      - y: a pair read at the level's last row starts one row early and the
        pair weights shift down one slot (the capped sample's second corner
        weight is 0).

    Returns (flats, srows (n,q) absolute pair-start rows, patch0 (n,),
    rel (n,q) pair starts within the backward window, x_start (n,),
    Wx (n,q,tile), wy2 (n,2q) shift-folded pair weights, count (n,),
    levels (n,), level_padded, G, dtype).
    """
    B, R = boxes.shape[:2]
    P = output_size
    G = max_grid if sampling_ratio <= 0 else sampling_ratio
    C = features[0].shape[-1]
    dtype = features[0].dtype
    if min_level is None:
        min_level = int(math.log2(strides[0]))
    PR = win_rows

    level_shapes = [f.shape[1:3] for f in features]
    flats = []
    level_padded = []
    row_pads = []
    for f in features:
        Hl, Wl = f.shape[1], f.shape[2]
        if Wl < tile or B * Hl < PR:
            # level too small for in-extent windows: pad (rows so a full
            # backward window fits, cols so any x window fits)
            pad_r = max(2, -(-PR // B) - Hl)
            flats.append(
                jnp.pad(f, ((0, 0), (0, pad_r), (0, tile), (0, 0)))
                .reshape(B * (Hl + pad_r), Wl + tile, C)
            )
            level_padded.append(True)
            row_pads.append(pad_r)
        else:
            flats.append(f.reshape(B * Hl, Wl, C))
            level_padded.append(False)
            row_pads.append(0)

    heights = jnp.array([h for h, _ in level_shapes], jnp.float32)
    widths = jnp.array([w for _, w in level_shapes], jnp.float32)
    scales = jnp.array([1.0 / s for s in strides], jnp.float32)
    h_img = jnp.array(
        [h + p for (h, _), p in zip(level_shapes, row_pads)], jnp.int32
    )
    rows_tot = jnp.array([fl.shape[0] for fl in flats], jnp.int32)
    w_eff = jnp.array([fl.shape[1] for fl in flats], jnp.int32)

    all_boxes = boxes.reshape(B * R, 4)
    n = B * R
    img_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), R)

    if len(level_shapes) > 1:
        levels = assign_boxes_to_levels(
            all_boxes, min_level, min_level + len(level_shapes) - 1,
            canonical_box_size, canonical_level,
        )
        # level-bump rule shared with _tiled_prep_2d: the footprint must
        # fit the (tile - 4) budget on its longer side
        budget = float(tile - 4)
        max_side = jnp.maximum(
            all_boxes[:, 2] - all_boxes[:, 0], all_boxes[:, 3] - all_boxes[:, 1]
        )
        fp = max_side / jnp.asarray(
            [float(s) for s in strides], jnp.float32
        )[levels]
        need = jnp.ceil(jnp.log2(jnp.maximum(fp / budget, 1.0))).astype(jnp.int32)
        levels = jnp.minimum(levels + need, len(level_shapes) - 1)
    else:
        levels = jnp.zeros((n,), jnp.int32)

    scale = scales[levels]
    h_l = heights[levels]
    w_l = widths[levels]
    row_off = img_idx * h_img[levels]

    x0 = all_boxes[:, 0] * scale - 0.5
    y0 = all_boxes[:, 1] * scale - 0.5
    x1 = jnp.maximum(all_boxes[:, 2] * scale - 0.5, x0)
    y1 = jnp.maximum(all_boxes[:, 3] * scale - 0.5, y0)
    bin_w = (x1 - x0) / P
    bin_h = (y1 - y0) / P

    if sampling_ratio > 0:
        grid_w = jnp.full_like(bin_w, G)
        grid_h = jnp.full_like(bin_h, G)
    else:
        grid_w = jnp.clip(jnp.ceil(bin_w), 1, G)
        grid_h = jnp.clip(jnp.ceil(bin_h), 1, G)
    count = jnp.maximum(grid_h * grid_w, 1.0)

    p_ar = jnp.arange(P, dtype=jnp.float32)
    g_ar = jnp.arange(G, dtype=jnp.float32)

    def axis_samples(o0, bin_sz, grid):
        pos = (
            o0[:, None, None]
            + p_ar[None, :, None] * bin_sz[:, None, None]
            + (g_ar[None, None, :] + 0.5) * bin_sz[:, None, None] / grid[:, None, None]
        )
        valid = g_ar[None, None, :] < grid[:, None, None]
        return pos, valid

    xs, x_valid = axis_samples(x0, bin_w, grid_w)
    ys, y_valid = axis_samples(y0, bin_h, grid_h)

    def corners(v, size):
        inside = (v >= -1.0) & (v <= size[:, None, None])
        v = jnp.maximum(v, 0.0)
        low = jnp.floor(v).astype(jnp.int32)
        sz = size.astype(jnp.int32)
        capped = low >= sz[:, None, None] - 1
        low = jnp.where(capped, sz[:, None, None] - 1, low)
        frac = jnp.where(capped, 0.0, v - low)
        return low, frac, inside

    x_low, lx, x_inside = corners(xs, w_l)
    y_low, ly, y_inside = corners(ys, h_l)

    q = P * G
    # ---- x: clamped window + shifted one-hot weights (no_pad rule)
    x_start = jnp.clip(x_low[:, 0, 0], 0, w_eff[levels] - tile)
    t_low = jnp.clip(x_low - x_start[:, None, None], 0, tile - 1)
    wx0 = jnp.where(x_inside & x_valid, (1.0 - lx), 0.0)
    wx1 = jnp.where(x_inside & x_valid, lx, 0.0)
    t_iota = jnp.arange(tile, dtype=jnp.int32)
    t_low_f = t_low.reshape(n, q)
    Wx = (
        wx0.reshape(n, q)[..., None] * (t_iota[None, None, :] == t_low_f[..., None])
        + wx1.reshape(n, q)[..., None]
        * (t_iota[None, None, :] == (t_low_f + 1)[..., None])
    ).astype(dtype)

    # ---- y: absolute level-local pair rows, clamped so the 2-row read
    # stays in-extent; pair weights shift-folded (shift only occurs for the
    # level's last row, where the sample is capped and wy1 == 0)
    o_raw = row_off[:, None, None] + y_low  # (n, P, G)
    s_r = jnp.minimum(o_raw, (rows_tot[levels] - 2)[:, None, None])
    shift = o_raw - s_r  # 0 or 1
    wy0 = jnp.where(y_inside & y_valid, 1.0 - ly, 0.0)
    wy1 = jnp.where(y_inside & y_valid, ly, 0.0)
    pair0 = jnp.where(shift == 0, wy0, 0.0)
    pair1 = jnp.where(shift == 0, wy1, wy0)
    wy2 = jnp.stack([pair0, pair1], axis=-1).reshape(n, 2 * q).astype(jnp.float32)
    srows = s_r.reshape(n, q).astype(jnp.int32)

    # ---- backward window: PR rows clamped into the level extent; the
    # bump budget bounds the pair-row span by tile - 2, so rel + 2 <= PR
    patch0 = jnp.clip(
        jnp.min(srows, axis=1), 0, rows_tot[levels] - PR
    ).astype(jnp.int32)
    rel = (srows - patch0[:, None]).astype(jnp.int32)
    # actual footprint of the window each box touches (rows incl. the
    # second pair row; cols incl. the wx1 slot) — the backward sizes its
    # chunked RMW DMAs from these instead of the full (PR, tile) window.
    # Zero-weight samples (masked grid positions / outside-image corners)
    # don't extend the footprint.
    y_live = (pair0 + pair1).reshape(n, q) > 0
    x_live = (wx0 + wx1).reshape(n, q) > 0
    rows_need = jnp.max(jnp.where(y_live, rel, 0), axis=1) + 2
    cols_need = jnp.minimum(
        jnp.max(jnp.where(x_live, t_low_f, 0), axis=1) + 2, tile
    )

    return (
        flats, srows, patch0, rel, x_start.astype(jnp.int32), Wx, wy2,
        count, levels.astype(jnp.int32), level_padded, G, dtype,
        rows_need.astype(jnp.int32), cols_need.astype(jnp.int32),
    )


def _pallas_roi_kernel_paired_ml(P, G, tile, C, group, depth, L):
    """Paired-DMA forward on per-level refs: the box's level (SMEM scalar)
    predicates which ref its q strided 2-row DMAs read (one L-way branch
    per box, all q starts inside it). Same sampling math as
    :func:`_pallas_roi_kernel_paired`."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = P * G

    def kernel(*args):
        (rows_ref, rowsN_ref, xs_ref, xsN_ref, lvl_ref, lvlN_ref,
         wy_ref, cnt_ref, wx_ref) = args[:9]
        flat_refs = args[9 : 9 + L]
        out_ref = args[9 + L]
        tiles, rows_sum, sems = args[10 + L :]

        i = pl.program_id(0)
        nprog = pl.num_programs(0)
        slot = jax.lax.rem(i, depth) if depth > 1 else 0
        nxt = jax.lax.rem(i + 1, depth) if depth > 1 else 0

        def dma(k, s, b, r, rows, xs):
            return pltpu.make_async_copy(
                flat_refs[k].at[pl.ds(rows[b, r], 2), pl.ds(xs[b, 0], tile)],
                tiles.at[s, b, r],
                sems.at[s, b],
            )

        def start(s, b, rows, xs, lvl):
            for k in range(L):
                @pl.when(lvl[b, 0] == k)
                def _():
                    for r in range(q):
                        dma(k, s, b, r, rows, xs).start()

        if depth > 1:
            @pl.when(i == 0)
            def _():
                for b in range(group):
                    start(0, b, rows_ref, xs_ref, lvl_ref)

            # rowsN/xsN/lvlN carry the NEXT group's scalars (roll(-group))
            @pl.when(i + 1 < nprog)
            def _():
                for b in range(group):
                    start(nxt, b, rowsN_ref, xsN_ref, lvlN_ref)
        else:
            for b in range(group):
                start(0, b, rows_ref, xs_ref, lvl_ref)

        for b in range(group):
            for r in range(q):
                # all refs share the slice shape/dtype: a descriptor built
                # on ref 0 waits the right byte count whichever ref the
                # start used
                dma(0, slot, b, r, rows_ref, xs_ref).wait()
            for py in range(P):
                acc = None
                for g in range(G):
                    r = py * G + g
                    t0 = tiles[slot, b, r, 0].astype(jnp.float32) * wy_ref[b, 2 * r]
                    t1 = tiles[slot, b, r, 1].astype(jnp.float32) * wy_ref[b, 2 * r + 1]
                    term = t0 + t1
                    acc = term if acc is None else acc + term
                rows_sum[py] = acc
            inv = 1.0 / cnt_ref[b, 0]
            for py in range(P):
                v = jax.lax.dot_general(
                    wx_ref[b],
                    rows_sum[py].reshape(tile, C),
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32,
                )
                out_ref[b, py] = (v * inv).astype(out_ref.dtype)

    return kernel


def batched_multilevel_roi_align_pallas_paired_ml(
    features: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 2,
    min_level: int | None = None,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    tile: int = 48,
    interpret: bool = False,
) -> jnp.ndarray:
    """Stage-free exact RoIAlign (training forward): per-level no-copy refs
    + q paired DMAs per box. Same sampling semantics as the flat2d paired
    kernel; the flat2d concat/pad staging is gone."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if len(features) == 1:
        # no level-bump budget on a single level: window sizes can't bound
        # the footprint, keep the padded-flat kernel
        return batched_multilevel_roi_align_pallas_paired(
            list(features), boxes, strides, output_size, sampling_ratio,
            max_grid, min_level, canonical_box_size, canonical_level, tile,
            interpret,
        )
    B, R = boxes.shape[:2]
    P = output_size
    C0 = features[0].shape[-1]
    packing = max(1, 4 // features[0].dtype.itemsize)
    c_mult = 128 * packing
    c_pad = (-C0) % c_mult
    if c_pad:
        features = [jnp.pad(f, ((0, 0),) * 3 + ((0, c_pad),)) for f in features]
    flats, srows, _, _, x_start, Wx, wy2, count, lvl, _, G, dtype, _, _ = (
        _tiled_prep_2d_ml(
            features, boxes, strides, output_size, sampling_ratio, max_grid,
            min_level, canonical_box_size, canonical_level, tile, tile,
        )
    )
    n = B * R
    C = features[0].shape[-1]
    q = P * G
    L = len(flats)

    WxB = Wx.reshape(n, P, G, tile).sum(axis=2).astype(jnp.float32)
    cnt = count.reshape(n, 1).astype(jnp.float32)
    xs = x_start.reshape(n, 1)
    lvl = lvl.reshape(n, 1)

    itemsize = jnp.dtype(dtype).itemsize
    depth = 2 if itemsize <= 2 else 1
    group = 8
    budget = 12 * 1024 * 1024

    def scratch_bytes(g, d):
        return (
            d * g * q * 2 * tile * C * itemsize
            + P * tile * C * 4
            + g * P * P * C * itemsize
        )

    while group > 1 and scratch_bytes(group, depth) > budget:
        group //= 2
    if depth == 2 and scratch_bytes(group, depth) > budget:
        depth = 1

    n_pad = ((n + group - 1) // group) * group
    if n_pad != n:
        pad = n_pad - n
        srows = jnp.pad(srows, ((0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, pad), (0, 0)))
        lvl = jnp.pad(lvl, ((0, pad), (0, 0)))
        WxB = jnp.pad(WxB, ((0, pad), (0, 0), (0, 0)))
        wy2 = jnp.pad(wy2, ((0, pad), (0, 0)))
        cnt = jnp.pad(cnt, ((0, pad), (0, 0)), constant_values=1.0)

    # next-group scalars at the same block index (started only when a next
    # grid step exists, so the wraparound values are never read)
    srowsN = jnp.roll(srows, -group, axis=0)
    xsN = jnp.roll(xs, -group, axis=0)
    lvlN = jnp.roll(lvl, -group, axis=0)

    kernel = _pallas_roi_kernel_paired_ml(P, G, tile, C, group, depth, L)
    flat_args = [f.reshape(f.shape[0], f.shape[1], C // 128, 128) for f in flats]
    smem = lambda shp: pl.BlockSpec(
        (group,) + shp, lambda i: (i,) + (0,) * len(shp), memory_space=pltpu.SMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[
            smem((q,)), smem((q,)), smem((1,)), smem((1,)), smem((1,)),
            smem((1,)), smem((2 * q,)), smem((1,)),
            pl.BlockSpec((group, P, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.ANY)] * L,
        out_specs=pl.BlockSpec(
            (group, P, P, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_pad, P, P, C), dtype, vma=out_vma(WxB, wy2, cnt)
        ),
        scratch_shapes=[
            pltpu.VMEM((depth, group, q, 2, tile, C // 128, 128), dtype),
            pltpu.VMEM((P, tile, C // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((depth, group)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        srows, srowsN, xs, xsN, lvl, lvlN, wy2, cnt, WxB, *flat_args,
    )
    out = out[:n].reshape(B, R, P, P, C)
    return out[..., : C - c_pad] if c_pad else out


def _pallas_roi_backward_kernel_ml(P, G, tile, C, PR, group, L, slots=4):
    """Pipelined patch-RMW backward on per-level accumulators.

    Each box reads its (PR, tile) window from its level's gradient
    accumulator, adds its bilinear-weighted output-grad contribution, and
    writes it back. The sequential TPU grid makes RMW race-free when run
    strictly serialized (the round-4 kernel, measured 0.28x DMA SOL); this
    kernel instead overlaps each box's read/write DMAs with its neighbours'
    compute, using prep-computed CONFLICT bits: conflict[k] == 0 certifies
    box k's window overlaps neither box k-1's nor box k-2's (same level +
    row/x interval tests), so read(k) may fly while write(k-1)/write(k-2)
    drain. The prep interleaves execution order (sorted-by-window, then
    strided across 16 streams) so adjacent-execution boxes come from far
    apart windows and conflicts are rare.

    Semaphore discipline (exactly-once): write(j) is waited either at box
    j+1 (when conflict[j+1]) or at box j+2's prologue (when
    ~conflict[j+1]); the complementary predicates make the pairing total.
    The final grid step drains write(N-1) unconditionally and write(N-2)
    iff ~conflict[N-1] (write(N-3)'s waiter pair is always in-grid).
    ``group`` must be a multiple of ``slots`` so each box's buffer slot
    (k % slots) is static under the unrolled in-step loop.
    """
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = P * G
    assert group % slots == 0
    # chunked RMW windows: the DMA reads/writes only the ceil-16-row x
    # ceil-24-col region the box actually touches (rows_need/cols_need
    # from the prep) instead of the full (PR, tile) window — typical
    # proposals touch ~1/5 of it. Chunks are symmetric read/write pairs,
    # so scratch content outside the refreshed chunks never reaches HBM.
    CY, CX = 16, 24
    assert PR % CY == 0 and tile % CX == 0
    KY, KX = PR // CY, tile // CX

    def kernel(*args):
        (p0_ref, p0n_ref, xs_ref, xsn_ref, lvl_ref, lvln_ref, rel_ref,
         wy_ref, cnt_ref, cflC, cflM, cflN, ny_ref, nx_ref, nyn_ref,
         nxn_ref, nym1_ref, nxm1_ref, nym2_ref, nxm2_ref, wx_ref,
         gout_ref) = args[:22]
        dflat_in = args[22 : 22 + L]
        dflat_out = args[22 + L : 22 + 2 * L]
        patches, drows, rsem, wsem = args[22 + 2 * L :]
        del dflat_in  # aliased with dflat_out

        i = pl.program_id(0)
        nprog = pl.num_programs(0)

        def chunks(fn, ny, nx, b):
            """Run fn(ky, kx) under the chunk-needed predicate. The same
            (ny, nx) values predicate a write's start and every one of its
            waits, keeping semaphore accounting exact."""
            for ky in range(KY):
                for kx in range(KX):
                    @pl.when((ny[b, 0] > ky * CY) & (nx[b, 0] > kx * CX))
                    def _():
                        fn(ky, kx)

        def rd_desc(k, s, b, p0, xs, ky, kx):
            return pltpu.make_async_copy(
                dflat_out[k].at[
                    pl.ds(p0[b, 0] + ky * CY, CY), pl.ds(xs[b, 0] + kx * CX, CX)
                ],
                patches.at[s, pl.ds(ky * CY, CY), pl.ds(kx * CX, CX)],
                rsem.at[s],
            )

        def wr_desc(k, s, b, ky, kx):
            return pltpu.make_async_copy(
                patches.at[s, pl.ds(ky * CY, CY), pl.ds(kx * CX, CX)],
                dflat_out[k].at[
                    pl.ds(p0_ref[b, 0] + ky * CY, CY),
                    pl.ds(xs_ref[b, 0] + kx * CX, CX),
                ],
                wsem.at[s],
            )

        def start_read(s, b, p0, xs, lvl, ny, nx):
            for k in range(L):
                @pl.when(lvl[b, 0] == k)
                def _():
                    chunks(lambda ky, kx: rd_desc(k, s, b, p0, xs, ky, kx).start(),
                           ny, nx, b)

        def wait_read(s, b, ny, nx):
            chunks(lambda ky, kx: rd_desc(0, s, b, p0_ref, xs_ref, ky, kx).wait(),
                   ny, nx, b)

        def start_write(s, b):
            for k in range(L):
                @pl.when(lvl_ref[b, 0] == k)
                def _():
                    chunks(lambda ky, kx: wr_desc(k, s, b, ky, kx).start(),
                           ny_ref, nx_ref, b)

        def wait_write(s, b, ny, nx, nb):
            # nb: block row holding the WRITER box's chunk counts
            chunks(lambda ky, kx: wr_desc(0, s, b, ky, kx).wait(), ny, nx, nb)

        for b in range(group):
            s = b % slots
            sm1 = (b - 1) % slots
            sp1 = (b + 1) % slots
            sm2 = (b - 2) % slots

            # -- prologue: designated wait of write(k-2) (iff its pair
            #    waiter at box k-1 didn't fire)
            if b >= 2:
                @pl.when(cflM[b, 0] == 0)
                def _():
                    wait_write(sm2, b, ny_ref, nx_ref, b - 2)
            else:
                @pl.when((i > 0) & (cflM[b, 0] == 0))
                def _():
                    wait_write(sm2, b, nym2_ref, nxm2_ref, b)

            # -- pre-issue read(k+1) when certified conflict-free
            if b + 1 < group:
                @pl.when(cflN[b, 0] == 0)
                def _():
                    start_read(sp1, b + 1, p0_ref, xs_ref, lvl_ref, ny_ref, nx_ref)
            else:
                # k+1 is the first box of the next grid step: its scalars
                # arrive via the roll(-1) arrays at this block position
                @pl.when((cflN[b, 0] == 0) & (i + 1 < nprog))
                def _():
                    start_read(sp1, b, p0n_ref, xsn_ref, lvln_ref, nyn_ref, nxn_ref)

            # -- compute drows(k) while DMAs fly:
            #    drows[py, t, c] = inv * sum_px WxB[px, t] * gout[py, px, c]
            c2 = C // 128
            inv = 1.0 / cnt_ref[b, 0]
            for py in range(P):
                for c in range(c2):
                    v = jax.lax.dot_general(
                        wx_ref[b],  # (P(px), tile)
                        gout_ref[b, py, :, c * 128 : (c + 1) * 128].astype(
                            jnp.float32
                        ),
                        (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32,
                    )  # (tile, 128)
                    drows[py, :, c] = v * inv

            # -- conflicted box: serialize behind write(k-1), then read
            if b >= 1:
                @pl.when(cflC[b, 0] == 1)
                def _():
                    wait_write(sm1, b, ny_ref, nx_ref, b - 1)
                    start_read(s, b, p0_ref, xs_ref, lvl_ref, ny_ref, nx_ref)
            else:
                # k == 0 (grid step 0) has no write(k-1) to wait on; its
                # conflict bit is forced to 1 by the prep
                @pl.when((cflC[b, 0] == 1) & (i > 0))
                def _():
                    wait_write(sm1, b, nym1_ref, nxm1_ref, b)

                @pl.when(cflC[b, 0] == 1)
                def _():
                    start_read(s, b, p0_ref, xs_ref, lvl_ref, ny_ref, nx_ref)

            wait_read(s, b, ny_ref, nx_ref)

            # -- accumulate the 2-row pairs into the window
            for r in range(q):
                py = r // G
                o = rel_ref[b, r]
                pair = patches[s, pl.ds(o, 2)]
                add0 = drows[py] * wy_ref[b, 2 * r]
                add1 = drows[py] * wy_ref[b, 2 * r + 1]
                patches[s, pl.ds(o, 2)] = pair + jnp.stack([add0, add1])

            # -- issue write(k); waited by box k+1 or k+2
            start_write(s, b)

        # -- drain the writes whose waiters fall past the grid: write(N-1)
        # always; write(N-2) iff its box-(N-1) waiter didn't fire
        # (write(N-3)'s waiter pair — box N-2 / box N-1's prologue — is
        # always in-grid)
        @pl.when(i == nprog - 1)
        def _():
            b_last = group - 1
            @pl.when(cflC[b_last, 0] == 0)
            def _():
                wait_write((b_last - 1) % slots, b_last, ny_ref, nx_ref, b_last - 1)
            wait_write(b_last % slots, b_last, ny_ref, nx_ref, b_last)

    return kernel


def _roi_align_ml_bwd_impl(
    features, boxes, strides, output_size, sampling_ratio, max_grid,
    min_level, canonical_box_size, canonical_level, tile, gout,
    interpret=False,
):
    """d(pooled)/d(features) via the pipelined per-level patch-RMW kernel.
    Returns per-level feature grads (f32, original NHWC shapes)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R = boxes.shape[:2]
    P = output_size
    C0 = features[0].shape[-1]
    packing = max(1, 4 // features[0].dtype.itemsize)
    c_mult = 128 * packing
    c_pad = (-C0) % c_mult
    if c_pad:
        features = [jnp.pad(f, ((0, 0),) * 3 + ((0, c_pad),)) for f in features]
    PR = tile
    (flats, _, patch0, rel, x_start, Wx, wy2, count, lvl, level_padded, G,
     dtype, rows_need, cols_need) = (
        _tiled_prep_2d_ml(
            features, boxes, strides, output_size, sampling_ratio, max_grid,
            min_level, canonical_box_size, canonical_level, tile, PR,
        )
    )
    n = B * R
    C = features[0].shape[-1]
    q = P * G
    L = len(flats)
    level_shapes = [f.shape[1:3] for f in features]

    WxB = Wx.reshape(n, P, G, tile).sum(axis=2).astype(jnp.float32)
    cnt = count.reshape(n, 1).astype(jnp.float32)
    gout_flat = gout.reshape(n, P, P, C0).astype(jnp.float32)
    if c_pad:
        gout_flat = jnp.pad(gout_flat, ((0, 0), (0, 0), (0, 0), (0, c_pad)))

    slots = 4
    group = 8
    budget = 12 * 1024 * 1024

    def scratch_bytes(g):
        return (
            slots * PR * tile * C * 4
            + P * tile * C * 4
            + g * P * P * C * 4
        )

    while group > slots and scratch_bytes(group) > budget:
        group //= 2

    # ---- pad to a group multiple with zero-weight dummy boxes whose
    # windows are spread across level 0 (kept serialized via conflict=1)
    n_pad = ((n + group - 1) // group) * group
    pad = n_pad - n
    rows0 = flats[0].shape[0]
    if pad:
        spread = (jnp.arange(pad, dtype=jnp.int32) * PR) % max(rows0 - PR, 1)
        patch0 = jnp.concatenate([patch0, spread])
        rel = jnp.pad(rel, ((0, pad), (0, 0)))
        x_start = jnp.pad(x_start, (0, pad))
        lvl = jnp.pad(lvl, (0, pad))
        wy2 = jnp.pad(wy2, ((0, pad), (0, 0)))
        cnt = jnp.pad(cnt, ((0, pad), (0, 0)), constant_values=1.0)
        WxB = jnp.pad(WxB, ((0, pad), (0, 0), (0, 0)))
        gout_flat = jnp.pad(gout_flat, ((0, pad), (0, 0), (0, 0), (0, 0)))
        rows_need = jnp.pad(rows_need, (0, pad), constant_values=2)
        cols_need = jnp.pad(cols_need, (0, pad), constant_values=2)

    # ---- interleaved execution order: sort by (level, window), then
    # stride across 16 streams so adjacent-execution boxes come from far
    # apart sorted positions (conflicts become rare instead of clustered).
    # int32-safe composite key: lvl | patch0 | coarse x (collisions only
    # blur ordering quality, never correctness — conflicts are computed
    # from the actual windows below)
    key = (
        jnp.clip(lvl, 0, 7) * (1 << 23)
        + jnp.clip(patch0, 0, (1 << 14) - 1) * (1 << 9)
        + jnp.clip(x_start // 4, 0, (1 << 9) - 1)
    ).astype(jnp.int32)
    sorted_idx = jnp.argsort(key)
    nstream = 16
    m = ((n_pad + nstream - 1) // nstream) * nstream
    import numpy as _np
    interleave = _np.arange(m).reshape(nstream, m // nstream).T.reshape(-1)
    interleave = interleave[interleave < n_pad][:n_pad]
    exec_idx = sorted_idx[jnp.asarray(interleave, jnp.int32)]

    p0p = patch0[exec_idx].reshape(n_pad, 1)
    relp = rel[exec_idx]
    xsp = x_start[exec_idx].reshape(n_pad, 1)
    lvlp = lvl[exec_idx].reshape(n_pad, 1)
    wy2p = wy2[exec_idx]
    cntp = cnt[exec_idx]
    WxBp = WxB[exec_idx]
    goutp = gout_flat[exec_idx]
    is_dummy = (exec_idx >= n)

    # conflict[k]: window of box k overlaps box k-1's or k-2's (same level
    # + interval intersection on rows and x). Dummies stay serialized.
    def ov(shift):
        lp = jnp.roll(lvlp[:, 0], shift)
        pp = jnp.roll(p0p[:, 0], shift)
        xp = jnp.roll(xsp[:, 0], shift)
        return (
            (lvlp[:, 0] == lp)
            & (jnp.abs(p0p[:, 0] - pp) < PR)
            & (jnp.abs(xsp[:, 0] - xp) < tile)
        )

    conflict = (ov(1) | ov(2) | is_dummy).astype(jnp.int32)
    conflict = conflict.at[0].set(1)
    cflC = conflict.reshape(n_pad, 1)
    cflM = jnp.roll(conflict, 1).reshape(n_pad, 1)   # conflict[k-1]
    cflN = jnp.roll(conflict, -1).reshape(n_pad, 1)  # conflict[k+1]
    p0n = jnp.roll(p0p, -1, axis=0)
    xsn = jnp.roll(xsp, -1, axis=0)
    lvln = jnp.roll(lvlp, -1, axis=0)
    nyp = rows_need[exec_idx].reshape(n_pad, 1)
    nxp = cols_need[exec_idx].reshape(n_pad, 1)
    nyn = jnp.roll(nyp, -1, axis=0)    # chunk counts of box k+1
    nxn = jnp.roll(nxp, -1, axis=0)
    nym1 = jnp.roll(nyp, 1, axis=0)    # of box k-1
    nxm1 = jnp.roll(nxp, 1, axis=0)
    nym2 = jnp.roll(nyp, 2, axis=0)    # of box k-2
    nxm2 = jnp.roll(nxp, 2, axis=0)

    zeros = [
        jnp.zeros((f.shape[0], f.shape[1], C // 128, 128), jnp.float32)
        for f in flats
    ]

    kernel = _pallas_roi_backward_kernel_ml(P, G, tile, C, PR, group, L, slots)
    smem = lambda w: pl.BlockSpec(
        (group, w), lambda i: (i, 0), memory_space=pltpu.SMEM
    )
    n_scalar_inputs = 22
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // group,),
        in_specs=[
            smem(1), smem(1), smem(1), smem(1), smem(1), smem(1), smem(q),
            smem(2 * q), smem(1), smem(1), smem(1), smem(1),
            smem(1), smem(1), smem(1), smem(1), smem(1), smem(1), smem(1),
            smem(1),
            pl.BlockSpec((group, P, tile), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (group, P, P, C), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ] + [pl.BlockSpec(memory_space=pltpu.ANY)] * L,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * L,
        out_shape=[
            jax.ShapeDtypeStruct(z.shape, jnp.float32, vma=out_vma(goutp, WxBp, z))
            for z in zeros
        ],
        scratch_shapes=[
            pltpu.VMEM((slots, PR, tile, C // 128, 128), jnp.float32),
            pltpu.VMEM((P, tile, C // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
        input_output_aliases={n_scalar_inputs + k: k for k in range(L)},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        p0p, p0n, xsp, xsn, lvlp, lvln, relp, wy2p, cntp, cflC, cflM, cflN,
        nyp, nxp, nyn, nxn, nym1, nxm1, nym2, nxm2,
        WxBp, goutp, *zeros,
    )

    grads = []
    for k, ((h, w), padded) in enumerate(zip(level_shapes, level_padded)):
        g = out[k].reshape(out[k].shape[0], out[k].shape[1], C)
        if padded:
            hp = g.shape[0] // B
            g = g.reshape(B, hp, g.shape[1], C)[:, :h, :w, :]
        else:
            g = g.reshape(B, h, w, C)
        grads.append(g[..., :C0] if c_pad else g)
    return tuple(grads)


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9),
)
def batched_multilevel_roi_align_pallas_train_ml(
    features: Tuple[jnp.ndarray, ...],
    boxes: jnp.ndarray,
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 2,
    min_level: int | None = None,
    canonical_box_size: int = 224,
    canonical_level: int = 4,
    tile: int = 48,
) -> jnp.ndarray:
    """Stage-free differentiable Pallas RoIAlign (round-5 training path).

    Forward: per-level no-copy paired-DMA kernel. Backward: pipelined
    conflict-predicated patch-RMW scatter into per-level accumulators.
    Replaces :func:`batched_multilevel_roi_align_pallas_trainable`'s flat2d
    staging in both directions. Box gradients are zero, matching the
    reference's detached proposals (fast_rcnn.py:188-190)."""
    return batched_multilevel_roi_align_pallas_paired_ml(
        list(features), boxes, strides, output_size, sampling_ratio,
        max_grid, min_level, canonical_box_size, canonical_level, tile,
    )


def _roi_train_ml_fwd(
    features, boxes, strides, output_size, sampling_ratio, max_grid,
    min_level, canonical_box_size, canonical_level, tile,
):
    out = batched_multilevel_roi_align_pallas_paired_ml(
        list(features), boxes, strides, output_size, sampling_ratio,
        max_grid, min_level, canonical_box_size, canonical_level, tile,
    )
    return out, (features, boxes)


def _roi_train_ml_bwd(
    strides, output_size, sampling_ratio, max_grid, min_level,
    canonical_box_size, canonical_level, tile, residuals, gout,
):
    features, boxes = residuals
    if len(features) == 1:
        grads = _roi_align_paired_bwd_impl(
            list(features), boxes, strides, output_size, sampling_ratio,
            max_grid, min_level, canonical_box_size, canonical_level, tile,
            gout,
        )
    else:
        grads = _roi_align_ml_bwd_impl(
            list(features), boxes, strides, output_size, sampling_ratio,
            max_grid, min_level, canonical_box_size, canonical_level, tile,
            gout,
        )
    grads = tuple(g.astype(f.dtype) for g, f in zip(grads, features))
    return grads, jnp.zeros_like(boxes)


batched_multilevel_roi_align_pallas_train_ml.defvjp(
    _roi_train_ml_fwd, _roi_train_ml_bwd
)
