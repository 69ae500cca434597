"""Region Proposal Network (flax, fixed-shape).

Behavioral counterpart of detectron2/modeling/proposal_generator/rpn.py
(StandardRPNHead:68, RPN:143) and proposal_utils.py (find_top_rpn_proposals).
TPU-first: anchor labeling/sampling is vmapped over the batch with PRNG
keys, proposal selection returns static (B, post_nms_topk) padded arrays,
and per-level NMS runs as a vmap over levels instead of a class-offset pass.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from lvc_tpu.modeling.anchors import AnchorGenerator
from lvc_tpu.modeling.box_regression import Box2BoxTransform
from lvc_tpu.modeling.matcher import Matcher
from lvc_tpu.modeling.sampling import global_ratio, per_image_keys, subsample_labels
from lvc_tpu.ops.nms import nms_mask, masked_topk, NEG_INF
from lvc_tpu.structures import boxes as box_ops


class StandardRPNHead(nn.Module):
    """3x3 conv + 1x1 objectness / 1x1 deltas (rpn.py:68-142)."""

    num_anchors: int
    conv_dim: int = 256

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]):
        from lvc_tpu.modeling.layers import Conv2d

        init = nn.initializers.normal(0.01)  # d2 rpn.py:106-109
        conv = Conv2d(self.conv_dim, 3, padding=1, kernel_init=init, name="conv")
        obj = Conv2d(self.num_anchors, 1, kernel_init=init, name="objectness_logits")
        deltas = Conv2d(self.num_anchors * 4, 1, kernel_init=init, name="anchor_deltas")
        logits, regs = [], []
        for x in features:
            t = nn.relu(conv(x))
            logits.append(obj(t))
            regs.append(deltas(t))
        return logits, regs


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float) -> jnp.ndarray:
    """fvcore smooth_l1_loss semantics: pure L1 when beta == 0."""
    diff = jnp.abs(pred - target)
    if beta <= 1e-8:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


class RPN(nn.Module):
    """Returns (proposals, objectness, valid, losses)."""

    in_features: Sequence[str]
    strides: Dict[str, int]
    anchor_sizes: Sequence[Sequence[float]]
    anchor_aspect_ratios: Sequence[Sequence[float]]
    anchor_offset: float = 0.0
    head_conv_dim: int = 256
    # matching / sampling
    iou_thresholds: Sequence[float] = (0.3, 0.7)
    iou_labels: Sequence[int] = (0, -1, 1)
    batch_size_per_image: int = 256
    positive_fraction: float = 0.5
    # losses
    bbox_reg_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    smooth_l1_beta: float = 0.0
    loss_weight: float = 1.0
    # proposal selection
    pre_nms_topk_train: int = 2000
    pre_nms_topk_test: int = 1000
    post_nms_topk_train: int = 1000
    post_nms_topk_test: int = 1000
    nms_thresh: float = 0.7
    min_box_size: float = 0.0
    # TPU-native approximate top-k (jax.lax.approx_max_k) for the per-level
    # pre-NMS selection — the exact top_k lowers to a full sort on TPU
    # (~2.7 ms/step at 832x1344). Off by default for reference parity;
    # serving configs can enable (cfg.MODEL.RPN.APPROX_TOPK).
    approx_topk: bool = False
    # RPN_Ignore: anchors overlapping gt ignore regions are excluded from
    # the RPN loss (see losses/label_one)
    ignore_regions: bool = False

    def setup(self):
        self.anchor_generator = AnchorGenerator(
            sizes=self.anchor_sizes,
            aspect_ratios=self.anchor_aspect_ratios,
            strides=[self.strides[f] for f in self.in_features],
            offset=self.anchor_offset,
        )
        num_anchors = self.anchor_generator.num_anchors
        assert len(set(num_anchors)) == 1, "all levels must have equal #anchors"
        self.head = StandardRPNHead(num_anchors[0], self.head_conv_dim, name="rpn_head")
        self.box2box = Box2BoxTransform(self.bbox_reg_weights)
        self.matcher = Matcher(
            list(self.iou_thresholds), list(self.iou_labels), allow_low_quality_matches=True
        )

    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        image_sizes: jnp.ndarray,  # (B, 2) true (h, w)
        gt_boxes: Optional[jnp.ndarray] = None,  # (B, G, 4)
        gt_valid: Optional[jnp.ndarray] = None,  # (B, G)
        gt_ignores: Optional[jnp.ndarray] = None,  # (B, G) bool
        *,
        train: bool = False,
    ):
        feats = [features[f] for f in self.in_features]
        logits_lvl, deltas_lvl = self.head(feats)
        grid_sizes = [f.shape[1:3] for f in feats]
        anchors_lvl = self.anchor_generator.grid_anchors(grid_sizes)  # [(HWA, 4)]

        B = feats[0].shape[0]
        A = self.anchor_generator.num_anchors[0]
        # NHWC conv outputs reshape directly to the reference's (H*W*A) order.
        # Box decode / NMS / losses always run in f32 (mixed-precision convs
        # may emit bf16 — coordinate math cannot afford 8 mantissa bits).
        # Deltas stay in the conv dtype as (B, H*W, A*4) — a pure bitcast of
        # the conv output — and are cast to f32 AFTER the per-level top-k
        # gather: casting/relayouting the full (B, HWA, 4) delta tensor cost
        # ~3.5 ms/step on p2 alone at 832x1344. Logits ARE cast to f32
        # before top-k: keeping them bf16 through the sort was tried
        # (round 4; selection is identical since bf16->f32 is monotonic)
        # and measured ~2 ms SLOWER end-to-end — XLA's TPU sort on bf16
        # keys costs more than the f32 convert+relayout it saves.
        logits_flat = [l.reshape(B, -1).astype(jnp.float32) for l in logits_lvl]
        deltas_flat = [d.reshape(B, d.shape[1] * d.shape[2], -1) for d in deltas_lvl]

        losses = {}
        if train and gt_boxes is not None:
            losses = self.losses(
                anchors_lvl, logits_flat, deltas_flat, gt_boxes, gt_valid,
                gt_ignores,
            )

        proposals, objectness, valid = self.predict_proposals(
            anchors_lvl, logits_flat, deltas_flat, image_sizes, train
        )
        return proposals, objectness, valid, losses

    # ------------------------------------------------------------------ loss
    def losses(
        self, anchors_lvl, logits_flat, deltas_flat, gt_boxes, gt_valid,
        gt_ignores=None,
    ):
        """Only the ``batch_size_per_image`` sampled anchors contribute to
        either loss (reference rpn.py:328-400), so all per-anchor loss inputs
        are gathered at the sampled indices instead of being computed over
        the full ~280k-anchor set: the full-size matched-gt gather, the f32
        cast of every delta, and the full-size smooth-l1/BCE cost
        ~20 ms/step at bs8 832x1344 before this restructure."""
        anchors = jnp.concatenate(anchors_lvl, axis=0)  # (R, 4)
        logits = jnp.concatenate(logits_flat, axis=1)  # (B, R)
        B = logits.shape[0]
        # keep deltas in the conv dtype; only sampled rows are cast to f32
        deltas = jnp.concatenate(
            [d.reshape(B, -1, 4) for d in deltas_flat], axis=1
        )  # (B, R, 4)

        rng = self.make_rng("sampling")
        keys = per_image_keys(rng, B)
        if gt_ignores is None or not self.ignore_regions:
            gt_ignores = jnp.zeros(gt_valid.shape, bool)

        def label_one(key, gt_b, gt_v, gt_ig):
            # ignore-region anchor labeling (the reference's RPN_Ignore
            # intent, lvc/modeling/proposal_generator/rpn.py:25-90 — its
            # shipped body is an unfinished stub that extracts
            # ``x.ignores`` and never applies it; here the semantics
            # mirror the ROI-heads gt_ignores toggle): ignore rows never
            # act as real matches, and an anchor whose IoU with any
            # ignore region exceeds the background threshold is excluded
            # from sampling entirely (label -1).
            real_gt = gt_v & ~gt_ig
            iou = box_ops.pairwise_iou(gt_b, anchors)  # (G, R)
            matched_idx, match_labels = self.matcher(iou, real_gt)
            # region exclusion uses intersection-over-anchor-area (the d2
            # crowd convention, structures/boxes.py pairwise_ioa): an
            # anchor mostly inside an ignore region is excluded even when
            # its IoU with the (much larger) region is small
            ig_rows = gt_v & gt_ig
            ioa = box_ops.pairwise_ioa(gt_b, anchors)  # (G, R)
            max_ig = jnp.max(jnp.where(ig_rows[:, None], ioa, 0.0), axis=0)
            match_labels = jnp.where(
                max_ig > 0.5, jnp.int8(-1), match_labels
            )
            idxs, is_pos, slot_valid = subsample_labels(
                key, match_labels, self.batch_size_per_image, self.positive_fraction
            )
            s_anchors = anchors[idxs]  # (S, 4)
            s_gt = gt_b[matched_idx[idxs]]  # (S, 4)
            return idxs, is_pos, slot_valid, s_anchors, s_gt

        idxs, is_pos, slot_valid, s_anchors, s_gt = jax.vmap(label_one)(
            keys, gt_boxes, gt_valid, gt_ignores
        )

        s_logits = jnp.take_along_axis(logits, idxs, axis=1).astype(
            jnp.float32
        )  # (B, S)
        s_deltas = jnp.take_along_axis(deltas, idxs[..., None], axis=1).astype(
            jnp.float32
        )  # (B, S, 4)

        gt_deltas = self.box2box.get_deltas(s_anchors, s_gt)
        loc = smooth_l1(s_deltas, gt_deltas, self.smooth_l1_beta).sum(-1)
        localization_loss = jnp.sum(jnp.where(is_pos, loc, 0.0))

        # BCE with logits over sampled anchors (rpn.py:390-397)
        lab_f = is_pos.astype(jnp.float32)
        bce = (
            jnp.maximum(s_logits, 0)
            - s_logits * lab_f
            + jnp.log1p(jnp.exp(-jnp.abs(s_logits)))
        )
        objectness_loss = jnp.sum(jnp.where(slot_valid, bce, 0.0))

        # constant per-image normalizer (reference rpn.py:381-383); summed
        # over the data axis so the DP loss equals the single-device loss
        normalizer = jnp.asarray(self.batch_size_per_image * B, jnp.float32)
        return {
            "loss_rpn_cls": global_ratio(objectness_loss, normalizer) * self.loss_weight,
            "loss_rpn_loc": global_ratio(localization_loss, normalizer) * self.loss_weight,
        }

    # ------------------------------------------------------------- proposals
    def predict_proposals(self, anchors_lvl, logits_flat, deltas_flat, image_sizes, train):
        pre_k = self.pre_nms_topk_train if train else self.pre_nms_topk_test
        post_k = self.post_nms_topk_train if train else self.post_nms_topk_test

        def per_image(logits_img, deltas_img, size):
            # per-level top-k pre-NMS (proposal_utils.py:57-77)
            lvl_boxes, lvl_scores, lvl_valid = [], [], []
            k_max = min(pre_k, max(l.shape[0] for l in logits_img))
            for anchors, logit, delta in zip(anchors_lvl, logits_img, deltas_img):
                k = min(pre_k, logit.shape[0])
                A4 = delta.shape[-1]
                A = A4 // 4
                if self.approx_topk and k < logit.shape[0]:
                    scores_k, order = jax.lax.approx_max_k(logit, k)
                else:
                    scores_k, order = jax.lax.top_k(logit, k)
                scores_k = scores_k.astype(jnp.float32)  # no-op on f32
                # delta is (H*W, A*4) in conv dtype; gather the top-k rows
                # then select each row's anchor slot — only k*4 values ever
                # get cast to f32
                rows = delta[order // A].reshape(k, A, 4)
                d_k = jnp.take_along_axis(
                    rows, (order % A)[:, None, None], axis=1
                )[:, 0].astype(jnp.float32)
                boxes = self.box2box.apply_deltas(d_k, anchors[order])
                # clip to image (proposal_utils.py:103)
                boxes = box_ops.clip(boxes, size[0].astype(boxes.dtype), size[1].astype(boxes.dtype))
                scores = scores_k
                valid = box_ops.nonempty(boxes, self.min_box_size)
                valid &= jnp.isfinite(scores)
                # pad level to k_max so levels stack uniformly
                pad = k_max - k
                if pad > 0:
                    boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
                    scores = jnp.pad(scores, (0, pad), constant_values=NEG_INF)
                    valid = jnp.pad(valid, (0, pad))
                lvl_boxes.append(boxes)
                lvl_scores.append(scores)
                lvl_valid.append(valid)

            boxes = jnp.stack(lvl_boxes)  # (L, K, 4)
            scores = jnp.stack(lvl_scores)
            valid = jnp.stack(lvl_valid)
            # per-level NMS == batched NMS with level ids (proposal_utils.py:107)
            keep = jax.vmap(lambda b, s, v: nms_mask(b, s, v, self.nms_thresh))(
                boxes, scores, valid
            )
            boxes = boxes.reshape(-1, 4)
            scores = scores.reshape(-1)
            keep = (keep & valid).reshape(-1)
            # choose post_nms_topk by score among kept (proposal_utils.py:120)
            order, topk_valid = masked_topk(scores, keep, post_k)
            return boxes[order], scores[order], topk_valid

        return jax.vmap(per_image)(logits_flat, deltas_flat, image_sizes)
