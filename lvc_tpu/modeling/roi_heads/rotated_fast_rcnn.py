"""Rotated Fast R-CNN: RROIHeads + fixed-shape rotated inference.

Behavioral counterpart of the reference's
``detectron2/modeling/roi_heads/rotated_fast_rcnn.py`` (276 LoC:
``fast_rcnn_inference_rotated``, ``RotatedFastRCNNOutputLayers``,
``RROIHeads``). Boxes are XYWHA (angle degrees CCW); regression is 5-dim
(:class:`~lvc_tpu.modeling.box_regression.Box2BoxTransformRotated`), pooling
is :func:`~lvc_tpu.ops.roi_align.roi_align_rotated`, and NMS is the
polygon-clip rotated variant. All shapes are static (padded slots + masks).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from lvc_tpu.modeling.box_regression import Box2BoxTransformRotated
from lvc_tpu.modeling.matcher import Matcher
from lvc_tpu.modeling.sampling import per_image_keys, subsample_labels
from lvc_tpu.modeling.roi_heads.box_head import FastRCNNConvFCHead
from lvc_tpu.modeling.roi_heads.fast_rcnn import (
    Detections,
    FastRCNNOutputLayers,
    fast_rcnn_losses,
)
from lvc_tpu.ops.nms import batched_nms_rotated_mask, masked_topk
from lvc_tpu.ops.roi_align import assign_boxes_to_levels, roi_align_rotated
from lvc_tpu.structures import rotated_boxes as rbox_ops


def fast_rcnn_inference_rotated_single_image(
    boxes: jnp.ndarray,  # (R, K*5) or (R, 5) XYWHA
    scores: jnp.ndarray,  # (R, K+1) softmax probabilities
    image_size: jnp.ndarray,  # (2,) true (h, w)
    proposal_valid: jnp.ndarray,  # (R,)
    score_thresh: float,
    nms_thresh: float,
    topk_per_image: int,
    pre_nms_candidates: int = 2048,
) -> Detections:
    """Score filter -> per-class rotated NMS -> top-k; mirrors the
    reference's fast_rcnn_inference_single_image_rotated."""
    r = scores.shape[0]
    k = scores.shape[1] - 1
    fg_scores = scores[:, :-1]
    num_reg = boxes.shape[-1] // 5
    boxes = boxes.reshape(r, num_reg, 5)
    boxes = rbox_ops.clip_rotated(
        boxes, image_size[0].astype(boxes.dtype), image_size[1].astype(boxes.dtype)
    )

    cand_valid = (fg_scores > score_thresh) & proposal_valid[:, None]
    flat_scores = fg_scores.reshape(-1)
    flat_valid = cand_valid.reshape(-1)
    n_cand = min(pre_nms_candidates, r * k)
    cand_idx, cand_ok = masked_topk(flat_scores, flat_valid, n_cand)
    prop_idx = cand_idx // k
    cls_idx = (cand_idx % k).astype(jnp.int32)
    if num_reg == 1:
        cand_boxes = boxes[prop_idx, 0]
    else:
        cand_boxes = boxes[prop_idx, cls_idx]
    cand_scores = flat_scores[cand_idx]

    keep = batched_nms_rotated_mask(cand_boxes, cand_scores, cls_idx, cand_ok, nms_thresh)
    order, det_valid = masked_topk(cand_scores, keep, topk_per_image)
    return Detections(
        boxes=cand_boxes[order],
        scores=cand_scores[order],
        classes=cls_idx[order],
        valid=det_valid,
        proposal_idx=prop_idx[order],
    )


def fast_rcnn_inference_rotated(
    boxes: jnp.ndarray,  # (B, R, K*5)
    scores: jnp.ndarray,  # (B, R, K+1)
    image_sizes: jnp.ndarray,  # (B, 2)
    proposal_valid: jnp.ndarray,  # (B, R)
    score_thresh: float,
    nms_thresh: float,
    topk_per_image: int,
    pre_nms_candidates: int = 2048,
) -> Detections:
    fn = lambda b, s, sz, v: fast_rcnn_inference_rotated_single_image(
        b, s, sz, v, score_thresh, nms_thresh, topk_per_image, pre_nms_candidates
    )
    return jax.vmap(fn)(boxes, scores, image_sizes, proposal_valid)


class RROIHeads(nn.Module):
    """Rotated StandardROIHeads: rotated matching/sampling -> multi-level
    rotated RoIAlign -> conv/fc head -> (K+1)-way classifier + 5-dim
    regressor (reference RROIHeads, rotated_fast_rcnn.py:135-276)."""

    in_features: Sequence[str]
    strides: Dict[str, int]
    num_classes: int = 80
    iou_thresholds: Sequence[float] = (0.5,)
    iou_labels: Sequence[int] = (0, 1)
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    proposal_append_gt: bool = True
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 0
    canonical_box_size: int = 224
    canonical_level: int = 4
    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    head_norm: str = ""
    # d2 RROIHeads forces class-agnostic=False and box_dim=5
    cls_agnostic_bbox_reg: bool = False
    bbox_reg_weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0, 1.0)
    smooth_l1_beta: float = 0.0
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    pre_nms_candidates: int = 2048

    def setup(self):
        self.box_head = FastRCNNConvFCHead(
            num_conv=self.num_conv,
            conv_dim=self.conv_dim,
            num_fc=self.num_fc,
            fc_dim=self.fc_dim,
            norm=self.head_norm,
        )
        self.box_predictor = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            box_dim=5,
        )
        self.box2box = Box2BoxTransformRotated(self.bbox_reg_weights)
        self.proposal_matcher = Matcher(
            list(self.iou_thresholds), list(self.iou_labels), allow_low_quality_matches=False
        )

    def label_and_sample_proposals(
        self,
        rng: jax.Array,
        proposals: jnp.ndarray,  # (B, P, 5)
        proposal_valid: jnp.ndarray,
        gt_boxes: jnp.ndarray,  # (B, G, 5)
        gt_classes: jnp.ndarray,
        gt_valid: jnp.ndarray,
    ):
        B = proposals.shape[0]
        if self.proposal_append_gt:
            proposals = jnp.concatenate([proposals, gt_boxes], axis=1)
            proposal_valid = jnp.concatenate([proposal_valid, gt_valid], axis=1)
        keys = per_image_keys(rng, B)

        def per_image(key, props, pvalid, gtb, gtc, gtv):
            iou = rbox_ops.pairwise_iou_rotated(gtb, props)
            matched_idx, matched_labels = self.proposal_matcher(iou, gtv)
            matched_labels = jnp.where(pvalid, matched_labels, jnp.int8(-1))
            cls = jnp.where(
                matched_labels == 1,
                gtc[matched_idx],
                jnp.where(matched_labels == 0, self.num_classes, -1),
            )
            sample_label = jnp.where(
                matched_labels == 1, 1, jnp.where(matched_labels == 0, 0, -1)
            )
            idxs, _, slot_valid = subsample_labels(
                key, sample_label, self.batch_size_per_image, self.positive_fraction
            )
            return (
                props[idxs],
                gtb[matched_idx[idxs]],
                jnp.where(slot_valid, cls[idxs], -1).astype(jnp.int32),
                slot_valid,
            )

        return jax.vmap(per_image)(
            keys, proposals, proposal_valid, gt_boxes, gt_classes, gt_valid
        )

    def pool(self, features: Dict[str, jnp.ndarray], boxes: jnp.ndarray) -> jnp.ndarray:
        """features: per-level (B, H, W, C); boxes (B, R, 5) XYWHA ->
        (B, R, P, P, C). Boxes pool on every level, then the per-box FPN
        level (sqrt-area rule on w*h) selects one — L small gathers instead
        of a dynamic scatter, keeping shapes static."""
        feats = [features[f] for f in self.in_features]
        strides = [self.strides[f] for f in self.in_features]
        min_level = int(math.log2(strides[0]))
        # reuse the axis-aligned level rule via a (w*h)-preserving proxy box
        zeros = jnp.zeros_like(boxes[..., 0])
        proxy = jnp.stack(
            [zeros, zeros, boxes[..., 2], boxes[..., 3]], axis=-1
        )  # area = w*h
        levels = assign_boxes_to_levels(
            proxy, min_level, min_level + len(feats) - 1,
            self.canonical_box_size, self.canonical_level,
        )  # (B, R) offsets from min_level

        def per_image(per_level_feats, rois, lvl):
            pooled = [
                roi_align_rotated(
                    f,
                    rois,
                    spatial_scale=1.0 / s,
                    output_size=self.pooler_resolution,
                    sampling_ratio=self.pooler_sampling_ratio,
                )
                for f, s in zip(per_level_feats, strides)
            ]
            stacked = jnp.stack(pooled)  # (L, R, P, P, C)
            return jnp.take_along_axis(
                stacked, lvl[None, :, None, None, None], axis=0
            )[0]

        return jax.vmap(per_image)(feats, boxes, levels)

    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        proposals: jnp.ndarray,  # (B, P, 5)
        proposal_valid: jnp.ndarray,
        image_sizes: jnp.ndarray,
        gt: Optional[Dict[str, jnp.ndarray]] = None,
        *,
        train: bool = False,
    ):
        if train:
            assert gt is not None
            rng = self.make_rng("sampling")
            boxes, gt_boxes, gt_classes, valid = self.label_and_sample_proposals(
                rng, proposals, proposal_valid, gt["boxes"], gt["classes"], gt["valid"]
            )
            B, S = gt_classes.shape
            pooled = self.pool(features, boxes)
            x = self.box_head(pooled.reshape(B * S, *pooled.shape[2:]), train=True)
            scores, deltas = self.box_predictor(x)
            return fast_rcnn_losses(
                scores,
                deltas,
                boxes.reshape(B * S, 5),
                gt_boxes.reshape(B * S, 5),
                gt_classes.reshape(B * S),
                valid.reshape(B * S),
                self.box2box,
                self.smooth_l1_beta,
            )
        B, P = proposals.shape[:2]
        pooled = self.pool(features, proposals)
        x = self.box_head(pooled.reshape(B * P, *pooled.shape[2:]), train=False)
        scores, deltas = self.box_predictor(x)
        probs = jax.nn.softmax(scores, axis=-1).reshape(B, P, -1)
        num_reg = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        d = deltas.reshape(B, P, num_reg, 5)
        boxes = self.box2box.apply_deltas(d, proposals[:, :, None, :])
        return fast_rcnn_inference_rotated(
            boxes.reshape(B, P, num_reg * 5),
            probs,
            image_sizes,
            proposal_valid,
            self.score_thresh_test,
            self.nms_thresh_test,
            self.detections_per_image,
            self.pre_nms_candidates,
        )
