"""Fixed-shape non-maximum suppression for TPU.

Replaces the reference's CUDA/torchvision NMS surface
(detectron2/layers/nms.py:10-29 `batched_nms` with the class-offset trick).
On TPU there is no dynamic-shape kernel: we return a *keep mask* over a
padded box set instead of a variable-length index list. Selection of the
top-k kept boxes is a separate masked top-k.

Algorithm: sort by score, then tiled greedy suppression — within each tile
of 128 boxes a fixpoint iteration resolves suppression chains (usually 2-4
rounds instead of 128 sequential steps), then one vectorized (T, N) IoU pass
suppresses all later boxes. This matches exact greedy NMS semantics
(including the reference's strict ``iou > threshold`` comparison).

A global-fixpoint variant (``_nms_mask_fixpoint``: build the full (N, N)
suppression matrix once, Jacobi-iterate ``x_{k+1}[j] = valid[j] & not
exists i<j: sup[i,j] & x_k[i]`` — provably exact since the prefix agreeing
with greedy grows every round) measured SLOWER on TPU v5e at detection
shapes (see ``nms_mask``), so it serves as a cross-check, not the default.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lvc_tpu.structures import boxes as box_ops

NEG_INF = -1e10


def _pad_to_multiple(n: int, t: int) -> int:
    return ((n + t - 1) // t) * t


def _nms_mask_impl(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    tile: int,
    iou_fn,
) -> jnp.ndarray:
    """Greedy NMS core shared by the axis-aligned and rotated variants."""
    n, box_dim = boxes.shape
    n_pad = _pad_to_multiple(max(n, tile), tile)
    if n_pad != n:
        boxes = jnp.pad(boxes, ((0, n_pad - n), (0, 0)))
        scores = jnp.pad(scores, (0, n_pad - n), constant_values=NEG_INF)
        valid = jnp.pad(valid, (0, n_pad - n))

    sort_scores = jnp.where(valid, scores, NEG_INF)
    # Stable descending sort: ties break toward the lower original index,
    # matching torch.sort(descending=True) stability.
    order = jnp.argsort(-sort_scores, stable=True)
    b = boxes[order]
    v = valid[order]

    num_tiles = n_pad // tile
    col_idx = jnp.arange(n_pad)
    tri = jnp.tril(jnp.ones((tile, tile), dtype=bool), k=-1)  # j suppressed by i<j rows

    def outer(i, active):
        start = i * tile
        tile_boxes = jax.lax.dynamic_slice(b, (start, 0), (tile, box_dim))
        act_tile = jax.lax.dynamic_slice(active, (start,), (tile,))
        iou_tt = iou_fn(tile_boxes, tile_boxes)
        sup_tt = (iou_tt > iou_threshold) & tri.T  # sup_tt[i, j]: row i can suppress col j (i < j)

        # Fixpoint: a box is suppressed iff some earlier SURVIVING box
        # overlaps it. Chains converge in a few rounds.
        def cond(state):
            prev, cur = state
            return jnp.any(prev != cur)

        def body(state):
            _, cur = state
            suppressed = jnp.any(sup_tt & cur[:, None], axis=0)
            return cur, act_tile & ~suppressed

        first = act_tile & ~jnp.any(sup_tt & act_tile[:, None], axis=0)
        _, act_tile_new = jax.lax.while_loop(cond, body, (act_tile, first))

        active = jax.lax.dynamic_update_slice(active, act_tile_new, (start,))
        # Vectorized suppression of all strictly-later boxes.
        iou_tn = iou_fn(tile_boxes, b)
        sup_cols = jnp.any((iou_tn > iou_threshold) & act_tile_new[:, None], axis=0)
        later = col_idx >= (start + tile)
        return active & ~(sup_cols & later)

    active = jax.lax.fori_loop(0, num_tiles, outer, v)

    keep_sorted = active
    keep = jnp.zeros((n_pad,), dtype=bool).at[order].set(keep_sorted)
    return keep[:n]


def _nms_mask_fixpoint(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    iou_fn,
) -> jnp.ndarray:
    """Global-fixpoint greedy NMS (exact; see module docstring).

    One (N, N) IoU pass + a handful of (N, N) masked-reduce rounds replaces
    the N/tile sequential dynamic-slice steps of the tiled version — much
    friendlier to TPU (no sequential outer loop, no dynamic slices).
    """
    n = boxes.shape[0]
    sort_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-sort_scores, stable=True)
    b = boxes[order]
    v = valid[order]

    iou = iou_fn(b, b)
    # sup[i, j]: row i (higher score, i < j) can suppress column j
    tri = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    sup = (iou > iou_threshold) & tri

    def cond(state):
        prev, cur = state
        return jnp.any(prev != cur)

    def body(state):
        _, cur = state
        suppressed = jnp.any(sup & cur[:, None], axis=0)
        return cur, v & ~suppressed

    first = v & ~jnp.any(sup & v[:, None], axis=0)
    _, keep_sorted = jax.lax.while_loop(cond, body, (v, first))
    return jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "tile"))
def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    tile: int = 128,
) -> jnp.ndarray:
    """Greedy NMS over a padded box set.

    Args:
        boxes: (N, 4) XYXY.
        scores: (N,).
        valid: (N,) bool; padding rows must be False.
        iou_threshold: suppress boxes with IoU *strictly greater* than this
            against a surviving higher-scored box (torchvision semantics).
    Returns:
        (N,) bool keep mask in the ORIGINAL input order.
    """
    # Measured on TPU v5e (B=16 N=2048 / B=80 N=1024): the tiled sequential
    # version beats the global fixpoint (2.8 vs 3.7 ms / 4.0 vs 5.8 ms) —
    # the (N, N) suppression matrix's HBM traffic per fixpoint round costs
    # more than the tile loop's latency. Tiled stays the default;
    # _nms_mask_fixpoint is kept as the exactness cross-check.
    return _nms_mask_impl(
        boxes, scores, valid, iou_threshold, tile, box_ops.pairwise_iou
    )


@functools.partial(jax.jit, static_argnames=("iou_threshold", "tile"))
def nms_rotated_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    tile: int = 128,
) -> jnp.ndarray:
    """Greedy NMS over padded XYWHA rotated boxes.

    Counterpart of the reference's ``nms_rotated`` CUDA/CPU kernel
    (detectron2/layers/csrc/nms_rotated/, registered in vision.cpp:70-110);
    same greedy semantics as :func:`nms_mask` with the polygon-clip IoU.
    """
    from lvc_tpu.structures import rotated_boxes as rbox_ops

    return _nms_mask_impl(
        boxes, scores, valid, iou_threshold, tile, rbox_ops.pairwise_iou_rotated
    )


def batched_nms_rotated_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Class-aware rotated NMS via the center-offset trick
    (reference detectron2/layers/nms.py:60-107 ``batched_nms_rotated``)."""
    # Offset centers only; w/h/angle keep their values so IoU within a class
    # is unchanged and boxes of different classes never overlap.
    cx, cy = boxes[..., 0], boxes[..., 1]
    half_diag = jnp.hypot(boxes[..., 2], boxes[..., 3]) / 2.0
    max_coord = jnp.max(
        jnp.where(valid, jnp.maximum(cx, cy) + half_diag, 0.0)
    ) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = jnp.concatenate(
        [boxes[..., :2] + offsets[..., None], boxes[..., 2:]], axis=-1
    )
    return nms_rotated_mask(shifted, scores, valid, iou_threshold)


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
) -> jnp.ndarray:
    """Class-aware NMS via the coordinate-offset trick
    (torchvision `batched_nms`, wrapped at detectron2/layers/nms.py:10).

    Args:
        idxs: (N,) integer category ids — boxes of different ids never
            suppress each other.
    """
    # Offset must exceed the coordinate range; use max over valid boxes.
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, valid, iou_threshold)


def masked_topk(
    scores: jnp.ndarray, valid: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the top-k valid entries by score (stable on ties) and a
    bool mask of which of the k slots are real. Fixed output size k."""
    neg = jnp.where(valid, scores, NEG_INF)
    k = min(k, scores.shape[0])
    # lax.top_k breaks ties toward the lower index — same order as
    # jnp.argsort(-neg, stable=True)[:k] but O(N log k) instead of a full
    # sort (the ROI stage calls this on R*K = 80k candidate scores).
    _, order = jax.lax.top_k(neg, k)
    topk_valid = valid[order]
    return order, topk_valid
