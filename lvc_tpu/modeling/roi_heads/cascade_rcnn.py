"""Cascade ROI heads: full Cascade R-CNN and the UBBR box-corrector.

Behavioral counterpart of lvc/modeling/roi_heads/cascade_rcnn.py
(CascadeROIHeads:34 with reg_only extension and _forward_box_qe:167) and
lvc/modeling/roi_heads/roi_heads.py (UBBRROIHeads:632,
CascadeUBBRROIHeads:696 with _ScaleGradient:41), plus the
BoxOnlyLayersCascade UBBR loss (roi_heads_cascade.py:140-195):
    loss = mean_fg( max(giou_after - lambda * giou_before, 0) )
(the lambda-delta form applies to the shared-head iterated corrector;
per-stage CascadeROIHeads uses plain mean giou_after, matching
``iterate = roi_heads_name != 'CascadeROIHeads'``).
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lvc_tpu.modeling.sampling import global_ratio
import flax.linen as nn

from lvc_tpu.modeling.box_regression import Box2BoxTransform
from lvc_tpu.modeling.matcher import Matcher
from lvc_tpu.modeling.roi_heads.box_head import FastRCNNConvFCHead
from lvc_tpu.modeling.roi_heads.fast_rcnn import (
    BoxOnlyLayers,
    FastRCNNOutputLayers,
    fast_rcnn_inference,
    fast_rcnn_losses,
)
from lvc_tpu.modeling.roi_heads.roi_heads import StandardROIHeads
from lvc_tpu.ops.roi_align import batched_multilevel_roi_align
from lvc_tpu.structures import boxes as box_ops


def scale_gradient(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Identity forward, gradient scaled by ``scale`` (_ScaleGradient)."""
    return x * scale + jax.lax.stop_gradient(x * (1.0 - scale))


class RegOnlyOutput(NamedTuple):
    """Corrected boxes aligned to the input candidate slots."""

    boxes: jnp.ndarray  # (B, R, 4)
    classes: jnp.ndarray  # (B, R)
    valid: jnp.ndarray  # (B, R)


def ubbr_box_loss(
    pred_boxes: jnp.ndarray,
    input_boxes: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    fg: jnp.ndarray,
    lambda_: float,
    iterate: bool,
) -> jnp.ndarray:
    """giou-delta loss (roi_heads_cascade.py:181-195)."""
    loss_after = 1.0 - box_ops.pairwise_giou(pred_boxes, gt_boxes)
    if iterate:
        loss_before = 1.0 - box_ops.pairwise_giou(input_boxes, gt_boxes)
        loss = jnp.maximum(loss_after - lambda_ * loss_before, 0.0)
    else:
        loss = loss_after
    return global_ratio(jnp.sum(jnp.where(fg, loss, 0.0)), jnp.sum(fg))


class CascadeROIHeads(StandardROIHeads):
    """Per-stage heads/matchers; supports the reg-only (UBBR) output layer.

    Extra knobs over StandardROIHeads:
        cascade_ious: per-stage matcher thresholds (first must equal
            iou_thresholds[0]).
        cascade_bbox_reg_weights: per-stage Box2BoxTransform weights.
        ubbr_lambda: lambda of the giou-delta loss.
    """

    cascade_ious: Sequence[float] = (0.5, 0.6, 0.7)
    cascade_bbox_reg_weights: Sequence[Sequence[float]] = (
        (10.0, 10.0, 5.0, 5.0),
        (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0),
    )
    ubbr_lambda: float = 0.6

    @property
    def num_stages(self) -> int:
        return len(self.cascade_ious)

    @property
    def reg_only(self) -> bool:
        return self.output_layer == "BoxOnlyLayersCascade"

    def setup(self):
        n = self.num_stages
        self.box_heads = [
            FastRCNNConvFCHead(
                num_conv=self.num_conv,
                conv_dim=self.conv_dim,
                num_fc=self.num_fc,
                fc_dim=self.fc_dim,
                norm=self.head_norm,
                dropout=self.dropout,
                name=f"box_head_{k}",
            )
            for k in range(n)
        ]
        if self.reg_only:
            self.box_predictors = [BoxOnlyLayers(name=f"box_predictor_{k}") for k in range(n)]
        else:
            self.box_predictors = [
                FastRCNNOutputLayers(
                    num_classes=self.num_classes,
                    cls_agnostic_bbox_reg=True,
                    name=f"box_predictor_{k}",
                )
                for k in range(n)
            ]
        self.stage_transforms = [
            Box2BoxTransform(w) for w in self.cascade_bbox_reg_weights
        ]
        self.stage_matchers = [
            Matcher([iou], [0, 1], allow_low_quality_matches=False)
            for iou in self.cascade_ious
        ]
        # stage-0 sampling reuses the base machinery
        self.proposal_matcher = self.stage_matchers[0]
        self.box2box = self.stage_transforms[0]

    # ------------------------------------------------------------- helpers
    def _match_stage(self, stage: int, boxes, gt_boxes, gt_classes, gt_valid):
        """Re-label boxes against gt with the stage matcher; no sampling
        (cascade_rcnn.py:_match_and_label_boxes)."""

        def per_image(bx, gtb, gtc, gtv):
            iou = box_ops.pairwise_iou(gtb, bx)
            matched_idx, labels = self.stage_matchers[stage](iou, gtv)
            cls = jnp.where(labels == 1, gtc[matched_idx], self.num_classes)
            return gtb[matched_idx], cls.astype(jnp.int32)

        return jax.vmap(per_image)(boxes, gt_boxes, gt_classes, gt_valid)

    def _run_stage(self, features, boxes, stage: int, train: bool):
        pooled = self.pool(features, boxes, train=train)
        B, R = pooled.shape[:2]
        x = pooled.reshape(B * R, *pooled.shape[2:])
        x = scale_gradient(x, 1.0 / self.num_stages)
        x = self.box_heads[stage](x, train=train)
        return self.box_predictors[stage](x)  # scores/deltas or deltas

    def _stage_deltas(self, predictions):
        if self.reg_only:
            return predictions
        return predictions[1]

    def _decode(self, stage: int, deltas, boxes, image_sizes):
        B, R = boxes.shape[:2]
        new_boxes = self.stage_transforms[stage].apply_deltas(
            deltas.reshape(B, R, 4), boxes
        )
        new_boxes = jax.vmap(
            lambda b, s: box_ops.clip(b, s[0].astype(b.dtype), s[1].astype(b.dtype))
        )(new_boxes, image_sizes)
        return jax.lax.stop_gradient(new_boxes)

    # ------------------------------------------------------------- forward
    def __call__(
        self,
        features,
        proposals,
        proposal_valid,
        image_sizes,
        gt: Optional[Dict] = None,
        *,
        train: bool = False,
        candidates_as_proposals: bool = False,
    ):
        if train:
            assert gt is not None
            rng = self.make_rng("sampling")
            sampled = self.label_and_sample_proposals(
                rng,
                proposals,
                proposal_valid,
                gt["boxes"],
                gt["classes"],
                gt["valid"],
                gt.get("ignores"),
            )
            boxes = sampled.boxes
            slot_valid = sampled.valid
            gt_b, cls = sampled.gt_boxes, sampled.gt_classes

            losses = {}
            for k in range(self.num_stages):
                if k > 0:
                    gt_b, cls = self._match_stage(k, boxes, gt["boxes"], gt["classes"], gt["valid"])
                predictions = self._run_stage(features, boxes, k, train)
                losses.update(self._stage_losses(k, predictions, boxes, gt_b, cls, slot_valid))
                deltas = self._stage_deltas(predictions)
                boxes = self._decode(k, deltas, boxes, image_sizes)
            return losses, sampled
        else:
            if candidates_as_proposals or self.reg_only:
                return self._inference_reg_only(
                    features, proposals, proposal_valid, image_sizes, gt
                )
            return self._inference_full(features, proposals, proposal_valid, image_sizes)

    def _stage_losses(self, stage, predictions, boxes, gt_b, cls, slot_valid):
        B, R = boxes.shape[:2]
        flat = lambda a: a.reshape((B * R,) + a.shape[2:])
        fg = flat(slot_valid) & (flat(cls) >= 0) & (flat(cls) < self.num_classes)
        deltas = self._stage_deltas(predictions)
        pred_boxes = self.stage_transforms[stage].apply_deltas(deltas, flat(boxes))
        if self.reg_only:
            loss = ubbr_box_loss(
                pred_boxes, flat(boxes), flat(gt_b), fg, self.ubbr_lambda, iterate=False
            )
            return {f"loss_box_reg_stage{stage}": loss}
        scores, _ = predictions
        losses = fast_rcnn_losses(
            scores,
            deltas,
            flat(boxes),
            flat(gt_b),
            flat(cls),
            flat(slot_valid),
            self.stage_transforms[stage],
            self.smooth_l1_beta,
            self.box_reg_loss_type,
        )
        return {f"{k}_stage{stage}": v for k, v in losses.items()}

    def _inference_reg_only(self, features, candidates, cand_valid, image_sizes, gt):
        """Cascade-regress candidate boxes; output aligned to input slots
        (_forward_box_qe, cascade_rcnn.py:167)."""
        boxes = candidates
        for k in range(self.num_stages):
            predictions = self._run_stage(features, boxes, k, False)
            deltas = self._stage_deltas(predictions)
            boxes = self._decode(k, deltas, boxes, image_sizes)
        classes = gt["classes"] if gt is not None else jnp.zeros(cand_valid.shape, jnp.int32)
        valid = cand_valid & (classes >= 0) & (classes < self.num_classes)
        return RegOnlyOutput(boxes=boxes, classes=classes, valid=valid), None

    def _inference_full(self, features, proposals, proposal_valid, image_sizes):
        boxes = proposals
        scores_sum = None
        for k in range(self.num_stages):
            predictions = self._run_stage(features, boxes, k, False)
            scores, deltas = predictions
            p = jax.nn.softmax(scores, axis=-1)
            scores_sum = p if scores_sum is None else scores_sum + p
            boxes = self._decode(k, deltas, boxes, image_sizes)
        B, R = proposals.shape[:2]
        probs = (scores_sum / self.num_stages).reshape(B, R, -1)
        dets = fast_rcnn_inference(
            boxes,
            probs,
            image_sizes,
            proposal_valid,
            self.score_thresh_test,
            self.nms_thresh_test,
            self.detections_per_image,
            self.pre_nms_candidates,
        )
        return dets, None


class CascadeUBBRROIHeads(CascadeROIHeads):
    """Shared head/predictor iterated K = UBBR.CASCADE_STEPS times with the
    lambda-delta loss (roi_heads.py:696-790)."""

    cascade_steps: int = 3

    @property
    def num_stages(self) -> int:
        return self.cascade_steps

    def setup(self):
        shared_head = FastRCNNConvFCHead(
            num_conv=self.num_conv,
            conv_dim=self.conv_dim,
            num_fc=self.num_fc,
            fc_dim=self.fc_dim,
            norm=self.head_norm,
            dropout=self.dropout,
            name="box_head",
        )
        shared_pred = BoxOnlyLayers(name="box_predictor")
        self.box_heads = [shared_head] * self.num_stages
        self.box_predictors = [shared_pred] * self.num_stages
        tr = Box2BoxTransform(self.bbox_reg_weights)
        self.stage_transforms = [tr] * self.num_stages
        # all steps re-match with the base threshold
        self.stage_matchers = [
            Matcher(list(self.iou_thresholds), [0, 1], allow_low_quality_matches=False)
        ] * self.num_stages
        self.proposal_matcher = self.stage_matchers[0]
        self.box2box = tr

    @property
    def reg_only(self) -> bool:
        return True

    def _stage_losses(self, stage, predictions, boxes, gt_b, cls, slot_valid):
        B, R = boxes.shape[:2]
        flat = lambda a: a.reshape((B * R,) + a.shape[2:])
        fg = flat(slot_valid) & (flat(cls) >= 0) & (flat(cls) < self.num_classes)
        deltas = self._stage_deltas(predictions)
        pred_boxes = self.stage_transforms[stage].apply_deltas(deltas, flat(boxes))
        loss = ubbr_box_loss(
            pred_boxes, flat(boxes), flat(gt_b), fg, self.ubbr_lambda, iterate=True
        )
        return {f"loss_box_reg_step{stage}": loss}


class UBBRROIHeads(StandardROIHeads):
    """Single-step box corrector: inference regresses the candidate (gt)
    boxes once and returns them aligned to input slots
    (roi_heads.py:632-694)."""

    def __call__(
        self,
        features,
        proposals,
        proposal_valid,
        image_sizes,
        gt: Optional[Dict] = None,
        *,
        train: bool = False,
        candidates_as_proposals: bool = False,
    ):
        if train:
            return super().__call__(
                features, proposals, proposal_valid, image_sizes, gt, train=True
            )
        boxes = proposals
        pooled = self.pool(features, boxes)
        B, R = pooled.shape[:2]
        x = pooled.reshape(B * R, *pooled.shape[2:])
        x = self.box_head(x, train=False)
        _, deltas = self.box_predictor(x)
        new_boxes = self.box2box.apply_deltas(deltas.reshape(B, R, -1)[..., :4], boxes)
        new_boxes = jax.vmap(
            lambda b, s: box_ops.clip(b, s[0].astype(b.dtype), s[1].astype(b.dtype))
        )(new_boxes, image_sizes)
        classes = gt["classes"] if gt is not None else jnp.zeros(proposal_valid.shape, jnp.int32)
        return RegOnlyOutput(boxes=new_boxes, classes=classes, valid=proposal_valid), None
