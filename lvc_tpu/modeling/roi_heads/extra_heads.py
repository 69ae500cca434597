"""Additional ROI-head variants.

Counterparts of lvc/modeling/roi_heads/roi_heads.py Res5ROIHeads:308 (the
C4 head: shared res5 transform + mean pool) and
ParallelStandardROIHeads:412 (twin base/novel heads with class-id
splitting, pairing with ``ckpt_surgery --method combine_parallel``), plus
StandardROIHeadsCascadeBBox (roi_heads_cascade.py:214 — Fast R-CNN head
with an extra class-agnostic regressor branch).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lvc_tpu.modeling.sampling import global_ratio
import flax.linen as nn

from lvc_tpu.modeling.backbone.resnet import BottleneckBlock
from lvc_tpu.modeling.roi_heads.fast_rcnn import (
    BoxOnlyLayers,
    Detections,
    fast_rcnn_losses,
)
from lvc_tpu.modeling.roi_heads.roi_heads import StandardROIHeads
from lvc_tpu.ops.nms import masked_topk


class Res5ROIHeads(StandardROIHeads):
    """C4 head: pool from res4 at 14^2, run a res5 stage, mean-pool, predict.

    Config expects in_features == ('res4',)."""

    num_groups: int = 1
    width_per_group: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    resnet_norm: str = "FrozenBN"

    def setup(self):
        super().setup()
        factor = 8
        out_channels = self.res2_out_channels * factor
        bottleneck = self.num_groups * self.width_per_group * factor
        self.res5 = [
            BottleneckBlock(
                out_channels=out_channels,
                bottleneck_channels=bottleneck,
                stride=2 if b == 0 else 1,
                num_groups=self.num_groups,
                norm=self.resnet_norm,
                stride_in_1x1=self.stride_in_1x1,
                has_shortcut=(b == 0),
                name=f"res5.{b}",
            )
            for b in range(3)
        ]

    def _head_features(self, features, boxes, train: bool):
        pooled = self.pool(features, boxes, train=train)  # (B, R, P, P, C)
        B, R = pooled.shape[:2]
        x = pooled.reshape(B * R, *pooled.shape[2:])
        for blk in self.res5:
            x = blk(x, train=train)
        return x.mean(axis=(1, 2)), (B, R)

    def __call__(self, features, proposals, proposal_valid, image_sizes, gt=None, *, train=False):
        if train:
            rng = self.make_rng("sampling")
            sampled = self.label_and_sample_proposals(
                rng, proposals, proposal_valid,
                gt["boxes"], gt["classes"], gt["valid"], gt.get("ignores"),
            )
            x, (B, S) = self._head_features(features, sampled.boxes, True)
            scores, deltas = self.box_predictor(x)
            losses = fast_rcnn_losses(
                scores,
                deltas,
                sampled.boxes.reshape(B * S, 4),
                sampled.gt_boxes.reshape(B * S, 4),
                sampled.gt_classes.reshape(B * S),
                sampled.valid.reshape(B * S),
                self.box2box,
                self.smooth_l1_beta,
                self.box_reg_loss_type,
            )
            return losses, sampled
        x, (B, P) = self._head_features(features, proposals, False)
        scores, deltas = self.box_predictor(x)
        from lvc_tpu.modeling.roi_heads.fast_rcnn import fast_rcnn_inference

        probs = jax.nn.softmax(scores, axis=-1).reshape(B, P, -1)
        boxes = self.box2box.apply_deltas(deltas.reshape(B, P, -1), proposals)
        dets = fast_rcnn_inference(
            boxes, probs, image_sizes, proposal_valid,
            self.score_thresh_test, self.nms_thresh_test,
            self.detections_per_image, self.pre_nms_candidates,
        )
        return dets, None


class ParallelStandardROIHeads(nn.Module):
    """Twin base/novel StandardROIHeads; gt split by seen/unseen ids with
    SPLIT_IDS remapping, detections merged at inference."""

    base_head: StandardROIHeads
    novel_head: StandardROIHeads
    seen_ids: Sequence[int]
    unseen_ids: Sequence[int]
    split_ids: Sequence[int]

    def __call__(self, features, proposals, proposal_valid, image_sizes, gt=None, *, train=False):
        seen = jnp.asarray(list(self.seen_ids), jnp.int32)
        unseen = jnp.asarray(list(self.unseen_ids), jnp.int32)
        split = jnp.asarray(list(self.split_ids), jnp.int32)

        if train:
            cls = gt["classes"]
            is_seen = jnp.isin(cls, seen)
            remapped = split[jnp.clip(cls, 0, split.shape[0] - 1)]
            gt_base = dict(gt, classes=remapped, valid=gt["valid"] & is_seen)
            gt_novel = dict(gt, classes=remapped, valid=gt["valid"] & ~is_seen)
            losses_b, _ = self.base_head(
                features, proposals, proposal_valid, image_sizes, gt_base, train=True
            )
            losses_n, _ = self.novel_head(
                features, proposals, proposal_valid, image_sizes, gt_novel, train=True
            )
            out = {f"base_{k}": v for k, v in losses_b.items()}
            out.update({f"novel_{k}": v for k, v in losses_n.items()})
            return out, None

        dets_b, _ = self.base_head(
            features, proposals, proposal_valid, image_sizes, None, train=False
        )
        dets_n, _ = self.novel_head(
            features, proposals, proposal_valid, image_sizes, None, train=False
        )
        # map back to the joint contiguous id space and merge
        cls_b = seen[dets_b.classes]
        cls_n = unseen[dets_n.classes]
        boxes = jnp.concatenate([dets_b.boxes, dets_n.boxes], axis=1)
        scores = jnp.concatenate([dets_b.scores, dets_n.scores], axis=1)
        classes = jnp.concatenate([cls_b, cls_n], axis=1)
        valid = jnp.concatenate([dets_b.valid, dets_n.valid], axis=1)
        prop_idx = jnp.concatenate([dets_b.proposal_idx, dets_n.proposal_idx], axis=1)
        return Detections(boxes, scores, classes, valid, prop_idx), None


class CascadeStandardROIHeads(StandardROIHeads):
    """Two-pass test-time box refinement (roi_heads.py:869-935).

    Training is plain StandardROIHeads. At inference the first pass decodes
    per-class boxes with NMS disabled (the reference passes nms_thresh=1.5
    and an unbounded top-k), the refined boxes are re-pooled and scored by
    the same head, and the second pass runs the standard score-filter /
    per-class NMS / top-k. TPU-first: "unbounded" becomes a fixed budget of
    ``refine_candidates`` slots (score-ranked, far above the ~1k surviving
    the 0.05 threshold in practice)."""

    refine_candidates: int = 512

    def __call__(self, features, proposals, proposal_valid, image_sizes, gt=None, *, train=False):
        if train:
            return super().__call__(
                features, proposals, proposal_valid, image_sizes, gt, train=True
            )
        B, P = proposals.shape[:2]
        pooled = self.pool(features, proposals)
        x = pooled.reshape(B * P, *pooled.shape[2:])
        x = self.box_head(x, train=False)
        scores, deltas = self.box_predictor(x)
        probs = jax.nn.softmax(scores, axis=-1).reshape(B, P, -1)
        boxes = self.box2box.apply_deltas(deltas.reshape(B, P, -1), proposals)
        from lvc_tpu.modeling.roi_heads.fast_rcnn import fast_rcnn_inference

        # pass 1: nms_thresh > 1 keeps every above-threshold candidate
        init = fast_rcnn_inference(
            boxes, probs, image_sizes, proposal_valid,
            self.score_thresh_test, 1.5,
            self.refine_candidates, self.pre_nms_candidates,
        )
        # pass 2: refined boxes as proposals, standard inference
        R = init.boxes.shape[1]
        pooled2 = self.pool(features, init.boxes)
        x2 = pooled2.reshape(B * R, *pooled2.shape[2:])
        x2 = self.box_head(x2, train=False)
        scores2, deltas2 = self.box_predictor(x2)
        probs2 = jax.nn.softmax(scores2, axis=-1).reshape(B, R, -1)
        boxes2 = self.box2box.apply_deltas(deltas2.reshape(B, R, -1), init.boxes)
        dets = fast_rcnn_inference(
            boxes2, probs2, image_sizes, init.valid,
            self.score_thresh_test, self.nms_thresh_test,
            self.detections_per_image, self.pre_nms_candidates,
        )
        return dets, None


class StandardROIHeadsCascadeBBox(StandardROIHeads):
    """Fast R-CNN head plus an extra class-agnostic regressor branch
    (roi_heads_cascade.py:214-396): the extra branch trains with a
    min-area-gated smooth-l1 on fg rows."""

    bbox_min_area: float = 200.0 ** 2

    def setup(self):
        super().setup()
        self.bbox_branch = BoxOnlyLayers(name="bbox_branch")

    def __call__(self, features, proposals, proposal_valid, image_sizes, gt=None, *, train=False):
        if not train:
            return super().__call__(
                features, proposals, proposal_valid, image_sizes, gt, train=False
            )
        rng = self.make_rng("sampling")
        sampled = self.label_and_sample_proposals(
            rng, proposals, proposal_valid,
            gt["boxes"], gt["classes"], gt["valid"], gt.get("ignores"),
        )
        B, S = sampled.gt_classes.shape
        pooled = self.pool(features, sampled.boxes, train=True)
        x = pooled.reshape(B * S, *pooled.shape[2:])
        x = self.box_head(x, train=True)
        scores, deltas = self.box_predictor(x)
        losses = fast_rcnn_losses(
            scores,
            deltas,
            sampled.boxes.reshape(B * S, 4),
            sampled.gt_boxes.reshape(B * S, 4),
            sampled.gt_classes.reshape(B * S),
            sampled.valid.reshape(B * S),
            self.box2box,
            self.smooth_l1_beta,
            self.box_reg_loss_type,
        )
        # extra class-agnostic regressor, min-area-gated
        extra_deltas = self.bbox_branch(x)
        gt_b = sampled.gt_boxes.reshape(B * S, 4)
        pb = sampled.boxes.reshape(B * S, 4)
        cls = sampled.gt_classes.reshape(B * S)
        area = (gt_b[:, 2] - gt_b[:, 0]) * (gt_b[:, 3] - gt_b[:, 1])
        fg = (
            sampled.valid.reshape(B * S)
            & (cls >= 0)
            & (cls < self.num_classes)
            & (area > self.bbox_min_area)
        )
        gt_deltas = self.box2box.get_deltas(pb, gt_b)
        from lvc_tpu.modeling.roi_heads.fast_rcnn import smooth_l1

        reg = smooth_l1(extra_deltas, gt_deltas, self.smooth_l1_beta).sum(-1)
        losses["loss_box_reg_branch"] = global_ratio(
            jnp.sum(jnp.where(fg, reg, 0.0)), jnp.sum(sampled.valid)
        )
        return losses, sampled
