"""RetinaNet meta-architecture (flax, fixed-shape).

Behavioral counterpart of the vendored
``detectron2/modeling/meta_arch/retinanet.py`` (448 LoC: RetinaNet:42,
RetinaNetHead:372): single-stage detector over FPN p3-p7 with a shared
4-conv cls/box tower, sigmoid focal loss, and per-level top-k + class-aware
NMS inference. TPU-first: anchor labeling is vmapped over the batch,
inference works on padded candidate sets, and the focal loss normalizer is
the per-batch positive-anchor count (the reference smooths it with an EMA
buffer, retinanet.py:207-214 — a mutable train-state detail that does not
change the optimum; we keep the stateless form so the train step stays a
pure function).
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lvc_tpu.modeling.sampling import global_ratio
import flax.linen as nn

from lvc_tpu.modeling.anchors import AnchorGenerator
from lvc_tpu.modeling.box_regression import Box2BoxTransform
from lvc_tpu.modeling.matcher import Matcher
from lvc_tpu.modeling.roi_heads.fast_rcnn import Detections, smooth_l1
from lvc_tpu.ops.nms import batched_nms_mask, masked_topk, NEG_INF
from lvc_tpu.structures import boxes as box_ops


def sigmoid_focal_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, alpha: float, gamma: float
) -> jnp.ndarray:
    """fvcore sigmoid_focal_loss semantics (used at retinanet.py:246-252)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


class RetinaNetHead(nn.Module):
    """Shared cls/box towers (retinanet.py:372-448): NUM_CONVS 3x3 convs +
    ReLU per tower, then A*K cls logits and A*4 box deltas; cls bias init
    -log((1-p)/p) so training starts near the prior probability."""

    num_classes: int
    num_anchors: int
    num_convs: int = 4
    conv_dim: int = 256
    prior_prob: float = 0.01

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]):
        from lvc_tpu.modeling.layers import Conv2d

        init = nn.initializers.normal(0.01)
        cls_tower = [
            Conv2d(self.conv_dim, 3, padding=1, kernel_init=init, name=f"cls_subnet_{i}")
            for i in range(self.num_convs)
        ]
        box_tower = [
            Conv2d(self.conv_dim, 3, padding=1, kernel_init=init, name=f"bbox_subnet_{i}")
            for i in range(self.num_convs)
        ]
        bias_value = -math.log((1.0 - self.prior_prob) / self.prior_prob)
        cls_score = Conv2d(
            self.num_anchors * self.num_classes,
            3,
            padding=1,
            kernel_init=init,
            bias_init=nn.initializers.constant(bias_value),
            name="cls_score",
        )
        bbox_pred = Conv2d(
            self.num_anchors * 4, 3, padding=1, kernel_init=init, name="bbox_pred"
        )
        logits, regs = [], []
        for x in features:
            t = x
            for conv in cls_tower:
                t = nn.relu(conv(t))
            logits.append(cls_score(t))
            t = x
            for conv in box_tower:
                t = nn.relu(conv(t))
            regs.append(bbox_pred(t))
        return logits, regs


class RetinaNet(nn.Module):
    """backbone (FPN p3-p7) -> RetinaNetHead -> focal/smooth-L1 losses or
    padded Detections. Same batch-dict contract as GeneralizedRCNN."""

    backbone: nn.Module
    in_features: Sequence[str]
    strides: Dict[str, int]
    num_classes: int = 80
    # anchors: per level, sizes with the 3 scale octaves of the reference
    anchor_sizes: Sequence[Sequence[float]] = ()
    anchor_aspect_ratios: Sequence[Sequence[float]] = ((0.5, 1.0, 2.0),)
    anchor_offset: float = 0.0
    num_convs: int = 4
    prior_prob: float = 0.01
    # matching
    iou_thresholds: Sequence[float] = (0.4, 0.5)
    iou_labels: Sequence[int] = (0, -1, 1)
    # losses
    focal_loss_alpha: float = 0.25
    focal_loss_gamma: float = 2.0
    smooth_l1_beta: float = 0.1
    bbox_reg_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    # inference
    score_thresh_test: float = 0.05
    topk_candidates_test: int = 1000
    nms_thresh_test: float = 0.5
    detections_per_image: int = 100
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)

    def setup(self):
        self.anchor_generator = AnchorGenerator(
            sizes=self.anchor_sizes,
            aspect_ratios=self.anchor_aspect_ratios,
            strides=[self.strides[f] for f in self.in_features],
            offset=self.anchor_offset,
        )
        num_anchors = self.anchor_generator.num_anchors
        assert len(set(num_anchors)) == 1
        self.head = RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=num_anchors[0],
            num_convs=self.num_convs,
            prior_prob=self.prior_prob,
            name="head",
        )
        self.box2box = Box2BoxTransform(self.bbox_reg_weights)
        self.matcher = Matcher(
            list(self.iou_thresholds), list(self.iou_labels), allow_low_quality_matches=True
        )

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        return (images - mean) / std

    def __call__(self, batch: Dict[str, jnp.ndarray], *, train: bool = False):
        from lvc_tpu.modeling.meta_arch.rcnn import model_images

        features = self.backbone(model_images(self, batch), train=train)
        feats = [features[f] for f in self.in_features]
        logits_lvl, deltas_lvl = self.head(feats)
        anchors_lvl = self.anchor_generator.grid_anchors([f.shape[1:3] for f in feats])

        B = feats[0].shape[0]
        K = self.num_classes
        # NHWC conv outputs flatten to the reference's (H*W*A, K) order
        logits_flat = [l.reshape(B, -1, K).astype(jnp.float32) for l in logits_lvl]
        deltas_flat = [d.reshape(B, -1, 4).astype(jnp.float32) for d in deltas_lvl]

        if train:
            return self.losses(
                anchors_lvl,
                logits_flat,
                deltas_flat,
                batch["gt_boxes"],
                batch["gt_classes"],
                batch["gt_valid"],
            )
        return self.inference(
            anchors_lvl, logits_flat, deltas_flat, batch["image_size"]
        )

    # ------------------------------------------------------------------ loss
    def losses(self, anchors_lvl, logits_flat, deltas_flat, gt_boxes, gt_classes, gt_valid):
        """Focal cls loss + smooth-L1 box loss, both summed over the batch
        and divided by the total positive-anchor count
        (retinanet.py:216-260; EMA smoothing of the normalizer omitted —
        see module docstring)."""
        anchors = jnp.concatenate(anchors_lvl, axis=0)  # (R, 4)
        logits = jnp.concatenate(logits_flat, axis=1)  # (B, R, K)
        deltas = jnp.concatenate(deltas_flat, axis=1)  # (B, R, 4)

        def label_one(gt_b, gt_c, gt_v):
            iou = box_ops.pairwise_iou(gt_b, anchors)  # (G, R)
            matched_idx, match_labels = self.matcher(iou, gt_v)
            cls = jnp.where(
                match_labels == 1,
                gt_c[matched_idx],
                jnp.where(match_labels == 0, self.num_classes, -1),
            )
            return cls, gt_b[matched_idx]

        cls_labels, matched_gt = jax.vmap(label_one)(gt_boxes, gt_classes, gt_valid)

        valid = cls_labels >= 0
        fg = valid & (cls_labels < self.num_classes)
        # raw count: global_ratio psums it over the data axis FIRST and
        # clamps after — clamping per-shard would change the loss whenever
        # a shard has zero positives
        num_pos = jnp.sum(fg).astype(jnp.float32)

        onehot = jax.nn.one_hot(
            jnp.clip(cls_labels, 0, self.num_classes - 1), self.num_classes
        )
        onehot = onehot * fg[..., None]
        cls_loss = sigmoid_focal_loss(
            logits, onehot, self.focal_loss_alpha, self.focal_loss_gamma
        ).sum(-1)
        loss_cls = global_ratio(jnp.sum(jnp.where(valid, cls_loss, 0.0)), num_pos)

        gt_deltas = self.box2box.get_deltas(
            jnp.broadcast_to(anchors, deltas.shape), matched_gt
        )
        reg = smooth_l1(deltas, gt_deltas, self.smooth_l1_beta).sum(-1)
        loss_box_reg = global_ratio(jnp.sum(jnp.where(fg, reg, 0.0)), num_pos)
        return {"loss_cls": loss_cls, "loss_box_reg": loss_box_reg}

    # ------------------------------------------------------------- inference
    def inference(self, anchors_lvl, logits_flat, deltas_flat, image_sizes) -> Detections:
        """Per level: flatten (anchor, class) pairs, score-filter at
        ``score_thresh``, keep top ``topk_candidates``; then merge levels and
        run class-aware NMS (retinanet.py:262-321)."""
        K = self.num_classes

        def per_image(logits_img, deltas_img, size):
            lvl_boxes, lvl_scores, lvl_cls, lvl_valid = [], [], [], []
            k_max = min(
                self.topk_candidates_test,
                max(l.shape[0] * K for l in logits_img),
            )
            for anchors, logit, delta in zip(anchors_lvl, logits_img, deltas_img):
                probs = jax.nn.sigmoid(logit).reshape(-1)  # (HWA*K,)
                ok = probs > self.score_thresh_test
                k = min(self.topk_candidates_test, probs.shape[0])
                idx, idx_ok = masked_topk(probs, ok, k)
                anchor_idx = idx // K
                cls_idx = (idx % K).astype(jnp.int32)
                boxes = self.box2box.apply_deltas(
                    delta[anchor_idx], anchors[anchor_idx]
                )
                boxes = box_ops.clip(
                    boxes, size[0].astype(boxes.dtype), size[1].astype(boxes.dtype)
                )
                scores = probs[idx]
                pad = k_max - k
                if pad > 0:
                    boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
                    scores = jnp.pad(scores, (0, pad), constant_values=NEG_INF)
                    cls_idx = jnp.pad(cls_idx, (0, pad))
                    idx_ok = jnp.pad(idx_ok, (0, pad))
                lvl_boxes.append(boxes)
                lvl_scores.append(scores)
                lvl_cls.append(cls_idx)
                lvl_valid.append(idx_ok)

            boxes = jnp.concatenate(lvl_boxes)
            scores = jnp.concatenate(lvl_scores)
            cls_idx = jnp.concatenate(lvl_cls)
            valid = jnp.concatenate(lvl_valid)
            keep = batched_nms_mask(boxes, scores, cls_idx, valid, self.nms_thresh_test)
            order, det_valid = masked_topk(scores, keep, self.detections_per_image)
            return Detections(
                boxes=boxes[order],
                scores=scores[order],
                classes=cls_idx[order],
                valid=det_valid,
                proposal_idx=order,
            )

        return jax.vmap(per_image)(logits_flat, deltas_flat, image_sizes)
