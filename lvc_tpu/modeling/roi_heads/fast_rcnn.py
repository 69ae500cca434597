"""Fast R-CNN output layers, losses, and fixed-shape inference.

Behavioral counterpart of lvc/modeling/roi_heads/fast_rcnn.py
(fast_rcnn_inference:51-137, FastRCNNOutputs:140-496,
FastRCNNOutputLayers:499, CosineSimOutputLayers:721). The TPU versions work
on padded (B, S, ...) slot arrays with validity masks; loss normalization
matches the reference exactly (sum over fg / total sampled regions).
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from lvc_tpu.modeling.box_regression import Box2BoxTransform
from lvc_tpu.modeling.sampling import global_ratio
from lvc_tpu.ops.nms import batched_nms_mask, masked_topk, NEG_INF
from lvc_tpu.structures import boxes as box_ops


class FastRCNNOutputLayers(nn.Module):
    """Linear classifier (K+1) + box regressor (4K or 4)."""

    num_classes: int
    cls_agnostic_bbox_reg: bool = False
    box_dim: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from lvc_tpu.modeling.layers import get_compute_dtype

        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        scores = nn.Dense(
            self.num_classes + 1,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
            dtype=get_compute_dtype(),
            name="cls_score",
        )(x)
        num_reg = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_reg * self.box_dim,
            kernel_init=nn.initializers.normal(0.001),
            bias_init=nn.initializers.zeros,
            dtype=get_compute_dtype(),
            name="bbox_pred",
        )(x)
        # heads hand f32 to box decode / softmax / losses regardless of the
        # conv compute dtype
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class CosineSimOutputLayers(nn.Module):
    """TFA cosine classifier (fast_rcnn.py:721-841): L2-normalized features x
    L2-normalized class weights x scale. scale == -1 => learnable."""

    num_classes: int
    scale: float = 20.0
    cls_agnostic_bbox_reg: bool = False
    box_dim: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        # cosine similarity runs in f32 even under mixed precision: the
        # normalization makes it numerically delicate and it's tiny
        x = x.astype(jnp.float32)
        w = self.param(
            "cls_score_weight", nn.initializers.normal(0.01), (x.shape[-1], self.num_classes + 1)
        )
        x_normalized = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-5)
        w_normalized = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + 1e-5)
        cos = x_normalized @ w_normalized
        if self.scale == -1:
            scale = self.param("scale", lambda _: jnp.array([20.0]))
            scores = scale * cos
        else:
            scores = self.scale * cos
        num_reg = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_reg * self.box_dim,
            kernel_init=nn.initializers.normal(0.001),
            bias_init=nn.initializers.zeros,
            name="bbox_pred",
        )(x)
        return scores, deltas


class BoxOnlyLayers(nn.Module):
    """Class-agnostic bbox-only regressor (roi_heads_cascade.py:26)."""

    box_dim: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        return nn.Dense(
            self.box_dim,
            kernel_init=nn.initializers.normal(0.001),
            bias_init=nn.initializers.zeros,
            name="bbox_pred",
        )(x.astype(jnp.float32))


# --------------------------------------------------------------------------
# Losses (padded-slot versions of FastRCNNOutputs.losses, fast_rcnn.py:296-430)
# --------------------------------------------------------------------------


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    if beta <= 1e-8:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def fast_rcnn_losses(
    class_logits: jnp.ndarray,  # (N, K+1)
    proposal_deltas: jnp.ndarray,  # (N, K*4) or (N, 4)
    proposal_boxes: jnp.ndarray,  # (N, 4)
    gt_boxes: jnp.ndarray,  # (N, 4) matched gt per proposal
    gt_classes: jnp.ndarray,  # (N,) in [0, K] (K = background)
    valid: jnp.ndarray,  # (N,) slot validity
    box2box: Box2BoxTransform,
    smooth_l1_beta: float = 0.0,
    box_reg_loss_type: str = "smooth_l1",
) -> Dict[str, jnp.ndarray]:
    """Cross-entropy (mean over valid) + box reg (sum over fg / total valid).

    The reference normalizes box reg by the TOTAL number of sampled regions
    (fast_rcnn.py:355-358 comment), and CE by mean over the concatenated
    sampled batch.
    """
    num_classes = class_logits.shape[-1] - 1
    # loss math always in f32 (mixed-precision runs emit bf16 logits)
    class_logits = class_logits.astype(jnp.float32)
    proposal_deltas = proposal_deltas.astype(jnp.float32)
    n_valid = jnp.sum(valid)

    # classification: softmax CE; ignore (-1) and padding rows masked out
    ce_valid = valid & (gt_classes >= 0)
    safe_cls = jnp.clip(gt_classes, 0, num_classes)
    logp = jax.nn.log_softmax(class_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, safe_cls[:, None], axis=-1)[:, 0]
    loss_cls = global_ratio(jnp.sum(jnp.where(ce_valid, ce, 0.0)), jnp.sum(ce_valid))

    # regression: fg rows only, class-specific delta columns
    fg = ce_valid & (gt_classes >= 0) & (gt_classes < num_classes)
    box_dim = proposal_boxes.shape[-1]
    cls_agnostic = proposal_deltas.shape[-1] == box_dim
    if cls_agnostic:
        pred_deltas = proposal_deltas
    else:
        d = proposal_deltas.reshape(proposal_deltas.shape[0], num_classes, box_dim)
        pred_deltas = jnp.take_along_axis(
            d, jnp.clip(gt_classes, 0, num_classes - 1)[:, None, None], axis=1
        )[:, 0]
    if box_reg_loss_type == "smooth_l1":
        gt_deltas = box2box.get_deltas(proposal_boxes, gt_boxes)
        reg = smooth_l1(pred_deltas, gt_deltas, smooth_l1_beta).sum(-1)
    elif box_reg_loss_type == "giou":
        pred_boxes = box2box.apply_deltas(pred_deltas, proposal_boxes)
        reg = 1.0 - box_ops.pairwise_giou(pred_boxes, gt_boxes)
    else:
        raise ValueError(box_reg_loss_type)
    loss_box_reg = global_ratio(jnp.sum(jnp.where(fg, reg, 0.0)), n_valid)
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box_reg}


# --------------------------------------------------------------------------
# Inference (fixed-shape fast_rcnn_inference_single_image, fast_rcnn.py:95-137)
# --------------------------------------------------------------------------


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (D, 4)
    scores: jnp.ndarray  # (D,)
    classes: jnp.ndarray  # (D,) int32
    valid: jnp.ndarray  # (D,) bool
    proposal_idx: jnp.ndarray  # (D,) index into the input proposals
    # optional task outputs (MASK_ON / KEYPOINT_ON)
    masks: Optional[jnp.ndarray] = None  # (D, M, M) probability masks
    keypoints: Optional[jnp.ndarray] = None  # (D, K, 3) (x, y, score)


def index_detections(dets: Detections, i) -> Detections:
    """Index one image's rows out of a batched Detections, passing
    through optional fields that are None (masks/keypoints)."""
    return type(dets)(*[None if f is None else f[i] for f in dets])


def fast_rcnn_inference_single_image(
    boxes: jnp.ndarray,  # (R, K*4) or (R, 4)
    scores: jnp.ndarray,  # (R, K+1) softmax probabilities
    image_size: jnp.ndarray,  # (2,) true (h, w)
    proposal_valid: jnp.ndarray,  # (R,)
    score_thresh: float,
    nms_thresh: float,
    topk_per_image: int,
    pre_nms_candidates: int = 2048,
) -> Detections:
    """Score filter -> per-class NMS -> top-k, all fixed-shape.

    The only divergence from the reference is the static
    ``pre_nms_candidates`` cap on (box, class) pairs entering NMS; with the
    default 0.05 score threshold the true candidate count is far below it.
    """
    r = scores.shape[0]
    k = scores.shape[1] - 1
    fg_scores = scores[:, :-1]  # (R, K)
    num_bbox_reg_classes = boxes.shape[-1] // 4
    boxes = boxes.reshape(r, num_bbox_reg_classes, 4)
    boxes = box_ops.clip(
        boxes, image_size[0].astype(boxes.dtype), image_size[1].astype(boxes.dtype)
    )

    cand_valid = (fg_scores > score_thresh) & proposal_valid[:, None]  # (R, K)
    flat_scores = fg_scores.reshape(-1)
    flat_valid = cand_valid.reshape(-1)
    # cap candidates entering NMS
    n_cand = min(pre_nms_candidates, r * k)
    cand_idx, cand_ok = masked_topk(flat_scores, flat_valid, n_cand)
    prop_idx = cand_idx // k
    cls_idx = (cand_idx % k).astype(jnp.int32)
    if num_bbox_reg_classes == 1:
        cand_boxes = boxes[prop_idx, 0]
    else:
        cand_boxes = boxes[prop_idx, cls_idx]
    cand_scores = flat_scores[cand_idx]

    keep = batched_nms_mask(cand_boxes, cand_scores, cls_idx, cand_ok, nms_thresh)
    order, det_valid = masked_topk(cand_scores, keep, topk_per_image)
    return Detections(
        boxes=cand_boxes[order],
        scores=cand_scores[order],
        classes=cls_idx[order],
        valid=det_valid,
        proposal_idx=prop_idx[order],
    )


def fast_rcnn_inference(
    boxes: jnp.ndarray,  # (B, R, K*4)
    scores: jnp.ndarray,  # (B, R, K+1)
    image_sizes: jnp.ndarray,  # (B, 2)
    proposal_valid: jnp.ndarray,  # (B, R)
    score_thresh: float,
    nms_thresh: float,
    topk_per_image: int,
    pre_nms_candidates: int = 2048,
) -> Detections:
    fn = lambda b, s, sz, v: fast_rcnn_inference_single_image(
        b, s, sz, v, score_thresh, nms_thresh, topk_per_image, pre_nms_candidates
    )
    return jax.vmap(fn)(boxes, scores, image_sizes, proposal_valid)
