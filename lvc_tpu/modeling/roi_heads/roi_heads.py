"""ROI heads (flax, fixed-shape).

Behavioral counterpart of lvc/modeling/roi_heads/roi_heads.py
(ROIHeads:90, StandardROIHeads:483, label_and_sample_proposals:173-245 incl.
the gt_ignores -> label -1 toggle). All per-image variable-length logic is
replaced by padded slots + masks, vmapped over the batch.
"""
from __future__ import annotations

import math
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from lvc_tpu.modeling.box_regression import Box2BoxTransform
from lvc_tpu.modeling.matcher import Matcher
from lvc_tpu.modeling.sampling import per_image_keys, subsample_labels
from lvc_tpu.modeling.roi_heads.box_head import FastRCNNConvFCHead
from lvc_tpu.modeling.roi_heads.fast_rcnn import (
    CosineSimOutputLayers,
    Detections,
    FastRCNNOutputLayers,
    fast_rcnn_inference,
    fast_rcnn_losses,
)
from lvc_tpu.ops.roi_align import (
    batched_multilevel_roi_align,
    batched_multilevel_roi_align_tiled,
)
from lvc_tpu.structures import boxes as box_ops

# objectness logit assigned to gt boxes appended to proposals
# (d2 proposal_utils.add_ground_truth_to_proposals: log((1-eps)/eps), eps=1e-10)
GT_PROPOSAL_LOGIT = math.log((1.0 - 1e-10) / 1e-10)


class SampledProposals(NamedTuple):
    boxes: jnp.ndarray  # (B, S, 4)
    gt_boxes: jnp.ndarray  # (B, S, 4) matched gt (garbage for bg rows)
    gt_classes: jnp.ndarray  # (B, S) in [0, K] (K = bg); -1 = ignore
    valid: jnp.ndarray  # (B, S)
    gt_idx: Optional[jnp.ndarray] = None  # (B, S) matched gt row index


class StandardROIHeads(nn.Module):
    """Pooler -> conv/fc head -> output layer, with train-time sampling."""

    in_features: Sequence[str]
    strides: Dict[str, int]
    num_classes: int = 80
    # matching / sampling
    iou_thresholds: Sequence[float] = (0.5,)
    iou_labels: Sequence[int] = (0, 1)
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    proposal_append_gt: bool = True
    # pooler
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 0
    # static cap on the adaptive sampling grid (reference uses unbounded
    # ceil(bin_size); TPU shapes must be static). Default 2: the pallas
    # kernels clamp to 2 anyway (VMEM scratch budget), so a larger default
    # only slows the exact/tiled XLA-gather path (CPU tests, dryrun) 4x
    # for zero TPU benefit. Grid 4 is exact for every FPN-assigned box
    # except near-image-sized ones; parity tests that need it opt in via
    # POOLER_MAX_GRID=4 explicitly. Deviation quantified in PARITY.md
    # (max score delta 4.4e-4 at grid 2).
    pooler_max_grid: int = 2
    canonical_box_size: int = 224
    canonical_level: int = 4
    # head
    num_conv: int = 0
    conv_dim: int = 256
    num_fc: int = 2
    fc_dim: int = 1024
    head_norm: str = ""
    dropout: float = 0.0
    # output layer
    output_layer: str = "FastRCNNOutputLayers"
    cosine_scale: float = 20.0
    cls_agnostic_bbox_reg: bool = False
    bbox_reg_weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0)
    smooth_l1_beta: float = 0.0
    box_reg_loss_type: str = "smooth_l1"
    reg_off: bool = False
    # test
    score_thresh_test: float = 0.05
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    pre_nms_candidates: int = 2048
    # cfg.DEBUG (lvc roi_heads.py:499,601): keep top-2 class scores per det
    debug: bool = False
    # "auto" (pallas DMA kernel on TPU, point gather elsewhere) |
    # "pallas" | "tiled" (XLA slice gather) | "exact" (point gather)
    pooler_impl: str = "auto"
    # mask head (MODEL.MASK_ON; reference roi_heads.py:531-532, mask_head.py)
    mask_on: bool = False
    mask_num_conv: int = 4
    mask_conv_dim: int = 256
    mask_pooler_resolution: int = 14
    cls_agnostic_mask: bool = False
    # keypoint head (MODEL.KEYPOINT_ON; keypoint_head.py)
    keypoint_on: bool = False
    num_keypoints: int = 17
    keypoint_num_conv: int = 8
    keypoint_conv_dim: int = 512
    keypoint_pooler_resolution: int = 14

    def setup(self):
        self.box_head = FastRCNNConvFCHead(
            num_conv=self.num_conv,
            conv_dim=self.conv_dim,
            num_fc=self.num_fc,
            fc_dim=self.fc_dim,
            norm=self.head_norm,
            dropout=self.dropout,
        )
        if self.output_layer == "CosineSimOutputLayers":
            self.box_predictor = CosineSimOutputLayers(
                num_classes=self.num_classes,
                scale=self.cosine_scale,
                cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            )
        else:
            self.box_predictor = FastRCNNOutputLayers(
                num_classes=self.num_classes,
                cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            )
        if self.mask_on:
            from lvc_tpu.modeling.roi_heads.mask_head import MaskRCNNConvUpsampleHead

            self.mask_head = MaskRCNNConvUpsampleHead(
                num_classes=self.num_classes,
                num_conv=self.mask_num_conv,
                conv_dim=self.mask_conv_dim,
                cls_agnostic_mask=self.cls_agnostic_mask,
                name="mask_head",
            )
        if self.keypoint_on:
            from lvc_tpu.modeling.roi_heads.keypoint_head import (
                KRCNNConvDeconvUpsampleHead,
            )

            self.keypoint_head = KRCNNConvDeconvUpsampleHead(
                num_keypoints=self.num_keypoints,
                num_conv=self.keypoint_num_conv,
                conv_dim=self.keypoint_conv_dim,
                name="keypoint_head",
            )
        self.box2box = Box2BoxTransform(self.bbox_reg_weights)
        self.proposal_matcher = Matcher(
            list(self.iou_thresholds), list(self.iou_labels), allow_low_quality_matches=False
        )

    # ------------------------------------------------------------- sampling
    def label_and_sample_proposals(
        self,
        rng: jax.Array,
        proposals: jnp.ndarray,  # (B, P, 4)
        proposal_valid: jnp.ndarray,  # (B, P)
        gt_boxes: jnp.ndarray,  # (B, G, 4)
        gt_classes: jnp.ndarray,  # (B, G)
        gt_valid: jnp.ndarray,  # (B, G)
        gt_ignores: Optional[jnp.ndarray] = None,  # (B, G) bool
    ) -> SampledProposals:
        B = proposals.shape[0]
        if self.proposal_append_gt:
            proposals = jnp.concatenate([proposals, gt_boxes], axis=1)
            proposal_valid = jnp.concatenate([proposal_valid, gt_valid], axis=1)
        if gt_ignores is None:
            gt_ignores = jnp.zeros(gt_valid.shape, bool)

        keys = per_image_keys(rng, B)
        pos_threshold = self.iou_thresholds[0]

        def per_image(key, props, pvalid, gtb, gtc, gtv, gti):
            # ignore-gt rows never act as real matches
            real_gt = gtv & ~gti
            iou = box_ops.pairwise_iou(gtb, props)
            matched_idx, matched_labels = self.proposal_matcher(iou, real_gt)
            # gt_ignores toggle (roi_heads.py:222-228): a proposal overlapping
            # an ignore region above the fg threshold is excluded entirely.
            ig_rows = gtv & gti
            max_ig = jnp.max(jnp.where(ig_rows[:, None], iou, 0.0), axis=0)
            matched_labels = jnp.where(
                max_ig > pos_threshold, jnp.int8(-1), matched_labels
            )
            # invalid proposal slots are never sampled
            matched_labels = jnp.where(pvalid, matched_labels, jnp.int8(-1))

            # per-proposal class label: fg -> gt class, bg -> K, ignore -> -1
            cls = jnp.where(
                matched_labels == 1,
                gtc[matched_idx],
                jnp.where(matched_labels == 0, self.num_classes, -1),
            )
            sample_label = jnp.where(
                matched_labels == 1, 1, jnp.where(matched_labels == 0, 0, -1)
            )
            idxs, is_pos, slot_valid = subsample_labels(
                key, sample_label, self.batch_size_per_image, self.positive_fraction
            )
            return SampledProposals(
                boxes=props[idxs],
                gt_boxes=gtb[matched_idx[idxs]],
                gt_classes=jnp.where(slot_valid, cls[idxs], -1).astype(jnp.int32),
                valid=slot_valid,
                gt_idx=matched_idx[idxs].astype(jnp.int32),
            )

        return jax.vmap(per_image)(
            keys, proposals, proposal_valid, gt_boxes, gt_classes, gt_valid, gt_ignores
        )

    # --------------------------------------------------------------- pooling
    def pool(
        self,
        features: Dict[str, jnp.ndarray],
        boxes: jnp.ndarray,
        train: bool = False,
        output_size: Optional[int] = None,
    ) -> jnp.ndarray:
        """features: per-level (B, H, W, C); boxes (B, R, 4) ->
        (B, R, P, P, C). Inference on TPU uses the pallas DMA RoIAlign
        (~10x the XLA point gather); training uses the exact gather kernel
        since the pallas call has no VJP (its backward would need
        scatter-accumulation across overlapping boxes)."""
        feats = [features[f] for f in self.in_features]
        strides = tuple(self.strides[f] for f in self.in_features)
        impl_name = self.pooler_impl
        if impl_name == "auto":
            import jax

            on_tpu = jax.default_backend() == "tpu"
            if train:
                # custom-VJP pallas pool (sequential patch-RMW backward);
                # ~6x the XLA chunked gather+scatter pair
                impl_name = "pallas_train" if on_tpu else "exact"
            else:
                impl_name = "pallas" if on_tpu else "exact"
        elif (
            train
            and impl_name.startswith("pallas")
            and not impl_name.startswith("pallas_train")
        ):
            # the inference pallas kernels have no VJP; training uses the
            # custom-VJP variant or the differentiable gather
            impl_name = "pallas_train"
        if impl_name == "pallas":
            from lvc_tpu.ops.roi_align import (
                batched_multilevel_roi_align_pallas_paired,
            )

            impl = batched_multilevel_roi_align_pallas_paired
        elif impl_name == "pallas_fast":
            # stage-free patch kernel (per-level refs, one DMA per box);
            # bit-identical to the band kernel, skips the flat2d staging
            from lvc_tpu.ops.roi_align import (
                batched_multilevel_roi_align_pallas_patch_ml,
            )

            impl = batched_multilevel_roi_align_pallas_patch_ml
        elif impl_name == "pallas_band":
            from lvc_tpu.ops.roi_align import (
                batched_multilevel_roi_align_pallas_fast,
            )

            impl = batched_multilevel_roi_align_pallas_fast
        elif impl_name in ("pallas_train", "pallas_train_flat"):
            # round 5: stage-free per-level train pool (no-copy forward +
            # pipelined RMW backward); "pallas_train_flat" keeps the
            # round-4 flat2d-staged variant for A/B comparison
            if impl_name == "pallas_train":
                from lvc_tpu.ops.roi_align import (
                    batched_multilevel_roi_align_pallas_train_ml as _train_pool,
                )
            else:
                from lvc_tpu.ops.roi_align import (
                    batched_multilevel_roi_align_pallas_trainable as _train_pool,
                )

            def impl(
                feats_list, bx, strides_, output_size=7, sampling_ratio=0,
                max_grid=2, min_level=None, canonical_box_size=224,
                canonical_level=4,
            ):
                # custom_vjp nondiff args must be positional
                return _train_pool(
                    tuple(feats_list), bx, strides_, output_size,
                    sampling_ratio, max_grid, min_level, canonical_box_size,
                    canonical_level,
                )
        elif impl_name == "tiled":
            impl = batched_multilevel_roi_align_tiled
        else:
            impl = batched_multilevel_roi_align
        # the pallas DMA kernels size VMEM scratch for grid <= 2; the
        # exact/trainable gather honors larger grids (POOLER_MAX_GRID)
        max_grid = self.pooler_max_grid
        if impl_name.startswith("pallas"):
            max_grid = min(max_grid, 2)
        return impl(
            feats,
            boxes,
            strides,
            output_size=output_size or self.pooler_resolution,
            sampling_ratio=self.pooler_sampling_ratio,
            max_grid=max_grid,
            min_level=int(math.log2(strides[0])),
            canonical_box_size=self.canonical_box_size,
            canonical_level=self.canonical_level,
        )

    def _mask_loss(self, features, sampled, gt, fg):
        """Mask R-CNN BCE on sampled fg proposals. ``gt["masks"]`` is a
        (B, G, Hm, Wm) bitmask tensor at any uniform downscale of the padded
        canvas (the scale is inferred from the first in_feature's grid)."""
        from lvc_tpu.modeling.roi_heads.mask_head import crop_gt_masks, mask_rcnn_loss

        B, S = sampled.gt_classes.shape
        M = self.mask_pooler_resolution * 2  # head upsamples 2x
        gt_masks = gt["masks"]
        f0 = features[self.in_features[0]]
        canvas_h = f0.shape[1] * self.strides[self.in_features[0]]
        scale = gt_masks.shape[2] / canvas_h  # static python float
        pooled = self.pool(
            features, sampled.boxes, train=True,
            output_size=self.mask_pooler_resolution,
        )
        logits = self.mask_head(pooled.reshape(B * S, *pooled.shape[2:]))

        def crops_one(masks_img, boxes_img, idx_img):
            return crop_gt_masks(
                masks_img,
                (masks_img.shape[1], masks_img.shape[2]),
                boxes_img * scale,
                idx_img,
                M,
            )

        crops = jax.vmap(crops_one)(gt_masks, sampled.boxes, sampled.gt_idx)
        return mask_rcnn_loss(
            logits,
            crops.reshape(B * S, M, M),
            sampled.gt_classes.reshape(B * S),
            fg.reshape(B * S),
        )

    def _keypoint_loss(self, features, sampled, gt, fg):
        """Keypoint CE on sampled fg proposals; ``gt["keypoints"]`` is
        (B, G, K, 3) image-coordinate (x, y, vis)."""
        from lvc_tpu.modeling.roi_heads.keypoint_head import keypoint_rcnn_loss

        B, S = sampled.gt_classes.shape
        pooled = self.pool(
            features, sampled.boxes, train=True,
            output_size=self.keypoint_pooler_resolution,
        )
        kp_logits = self.keypoint_head(pooled.reshape(B * S, *pooled.shape[2:]))
        kps = jax.vmap(lambda k, i: k[i])(gt["keypoints"], sampled.gt_idx)
        return keypoint_rcnn_loss(
            kp_logits,
            kps.reshape(B * S, *kps.shape[2:]),
            sampled.boxes.reshape(B * S, 4),
            fg.reshape(B * S),
        )

    # --------------------------------------------------------------- forward
    def __call__(
        self,
        features: Dict[str, jnp.ndarray],
        proposals: jnp.ndarray,  # (B, P, 4)
        proposal_valid: jnp.ndarray,  # (B, P)
        image_sizes: jnp.ndarray,  # (B, 2)
        gt: Optional[Dict[str, jnp.ndarray]] = None,
        *,
        train: bool = False,
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
            B, S = sampled.gt_classes.shape
            pooled = self.pool(features, sampled.boxes, train=True)  # (B, S, P, P, C)
            x = pooled.reshape(B * S, *pooled.shape[2:])
            x = self.box_head(x, train=True)
            scores, deltas = self.box_predictor(x)
            if self.reg_off:
                # REG_OFF zeroing (roi_heads.py:597): regression branch off
                deltas = deltas * 0.0
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
            fg = (
                sampled.valid
                & (sampled.gt_classes >= 0)
                & (sampled.gt_classes < self.num_classes)
            )
            if self.mask_on and gt is not None and "masks" in gt:
                losses["loss_mask"] = self._mask_loss(features, sampled, gt, fg)
            if self.keypoint_on and gt is not None and "keypoints" in gt:
                losses["loss_keypoint"] = self._keypoint_loss(features, sampled, gt, fg)
            return losses, sampled
        else:
            B, P = proposals.shape[:2]
            pooled = self.pool(features, proposals)
            x = pooled.reshape(B * P, *pooled.shape[2:])
            x = self.box_head(x, train=False)
            scores, deltas = self.box_predictor(x)
            probs = jax.nn.softmax(scores, axis=-1).reshape(B, P, -1)
            boxes = self.box2box.apply_deltas(
                deltas.reshape(B, P, -1), proposals
            )  # (B, P, K*4)
            infer = fast_rcnn_inference
            if self.debug:
                from lvc_tpu.modeling.roi_heads.fast_rcnn_debug import (
                    fast_rcnn_inference_debug,
                )

                infer = fast_rcnn_inference_debug
            dets = infer(
                boxes,
                probs,
                image_sizes,
                proposal_valid,
                self.score_thresh_test,
                self.nms_thresh_test,
                self.detections_per_image,
                self.pre_nms_candidates,
            )
            if self.mask_on:
                from lvc_tpu.modeling.roi_heads.mask_head import mask_rcnn_inference

                Bd, D = dets.classes.shape
                pooled_m = self.pool(
                    features, dets.boxes, output_size=self.mask_pooler_resolution
                )
                logits = self.mask_head(
                    pooled_m.reshape(Bd * D, *pooled_m.shape[2:])
                )
                m = mask_rcnn_inference(logits, dets.classes.reshape(Bd * D))
                dets = dets._replace(masks=m.reshape(Bd, D, *m.shape[1:]))
            if self.keypoint_on:
                from lvc_tpu.modeling.roi_heads.keypoint_head import (
                    keypoint_rcnn_inference,
                )

                Bd, D = dets.classes.shape
                pooled_k = self.pool(
                    features, dets.boxes, output_size=self.keypoint_pooler_resolution
                )
                kp_logits = self.keypoint_head(
                    pooled_k.reshape(Bd * D, *pooled_k.shape[2:])
                )
                kps = keypoint_rcnn_inference(kp_logits, dets.boxes.reshape(Bd * D, 4))
                dets = dets._replace(keypoints=kps.reshape(Bd, D, *kps.shape[1:]))
            return dets, None
