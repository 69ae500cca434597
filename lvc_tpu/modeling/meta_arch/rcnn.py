"""Generalized R-CNN meta-architectures (flax).

Behavioral counterpart of lvc/modeling/meta_arch/rcnn.py
(GeneralizedRCNN:25, GeneralizedRCNNRegOnly:336, ProposalNetwork:413).
The model consumes a fixed-shape padded batch dict and returns loss dicts
(train) or padded Detections (inference); host-side post-processing
(rescaling to original image sizes) lives in the evaluator.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lvc_tpu.modeling.sampling import global_ratio
import flax.linen as nn

from lvc_tpu.modeling.backbone.fpn import FPN, fpn_strides
from lvc_tpu.modeling.backbone.resnet import ResNet
from lvc_tpu.modeling.proposal_generator.rpn import RPN
from lvc_tpu.modeling.roi_heads.roi_heads import StandardROIHeads


def model_images(module: nn.Module, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """The backbone input tensor for a meta-arch with ``backbone``/
    ``pixel_mean``/``pixel_std`` attributes. Prefers the loader-produced
    ``image_s2d`` (already normalized + padded + space-to-depth,
    transforms.s2d_canvas) when the backbone stem consumes it — skipping
    the device-side normalize + relayout; otherwise normalizes the raw
    padded canvas on device."""
    backbone_core = getattr(module.backbone, "bottom_up", module.backbone)
    if "image_s2d" in batch and getattr(backbone_core, "supports_s2d_input", False):
        return batch["image_s2d"]
    images = batch["image"]
    mean = jnp.asarray(module.pixel_mean, images.dtype)
    std = jnp.asarray(module.pixel_std, images.dtype)
    x = (images - mean) / std
    # reference ImageList semantics (detectron2 structures/image_list.py:8):
    # padding is applied AFTER per-image normalization, so pad pixels are 0
    # in normalized space. The loader's s2d path already zeroes the pad
    # region host-side (space_to_depth_host); mask here so the device-side
    # fallback matches — otherwise pads normalize to -mean/std and the
    # backbone sees different boundary context than the reference.
    if "image_size" in batch:
        H, W = images.shape[1:3]
        hs = batch["image_size"][:, 0][:, None, None, None]
        ws = batch["image_size"][:, 1][:, None, None, None]
        row = jnp.arange(H)[None, :, None, None]
        col = jnp.arange(W)[None, None, :, None]
        x = jnp.where((row < hs) & (col < ws), x, jnp.zeros((), x.dtype))
    return x


class GeneralizedRCNN(nn.Module):
    """backbone -> RPN -> ROI heads.

    Batch dict contract (all padded, fixed shapes):
        image:        (B, H, W, 3) float32 raw pixels in cfg INPUT.FORMAT order
        image_size:   (B, 2) int32 true (h, w) inside the padded canvas
        gt_boxes:     (B, G, 4) float32 XYXY       (train)
        gt_classes:   (B, G) int32                  (train)
        gt_valid:     (B, G) bool                   (train)
        gt_ignores:   (B, G) bool (optional)        (train)
        proposal_boxes/proposal_logits/proposal_valid: precomputed proposals
            (when the proposal generator is 'PrecomputedProposals' / RBG)
    """

    backbone: nn.Module
    proposal_generator: Optional[nn.Module]
    roi_heads: nn.Module
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        return (images - mean) / std

    def backbone_features(self, batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """Preprocess + backbone only (feature probing / parity tests)."""
        return self.backbone(model_images(self, batch), train=False)

    def __call__(self, batch: Dict[str, jnp.ndarray], *, train: bool = False):
        features = self.backbone(model_images(self, batch), train=train)
        image_sizes = batch["image_size"]

        gt_boxes = batch.get("gt_boxes")
        gt_valid = batch.get("gt_valid")

        if self.proposal_generator is not None:
            pg_kwargs = {}
            if type(self.proposal_generator).__name__ == "RBG":
                pg_kwargs = dict(
                    proposal_boxes=batch.get("proposal_boxes"),
                    proposal_logits=batch.get("proposal_logits"),
                    proposal_valid=batch.get("proposal_valid"),
                )
            elif "gt_ignores" in batch:
                pg_kwargs = dict(gt_ignores=batch["gt_ignores"])
            proposals, objectness, prop_valid, rpn_losses = self.proposal_generator(
                features, image_sizes, gt_boxes, gt_valid, train=train, **pg_kwargs
            )
        else:
            proposals = batch["proposal_boxes"]
            objectness = batch["proposal_logits"]
            prop_valid = batch["proposal_valid"]
            rpn_losses = {}

        gt = None
        if train:
            gt = {
                "boxes": batch["gt_boxes"],
                "classes": batch["gt_classes"],
                "valid": batch["gt_valid"],
            }
            if "gt_ignores" in batch:
                gt["ignores"] = batch["gt_ignores"]
            if "gt_masks" in batch:
                gt["masks"] = batch["gt_masks"]
            if "gt_keypoints" in batch:
                gt["keypoints"] = batch["gt_keypoints"]

        out, aux = self.roi_heads(
            features, proposals, prop_valid, image_sizes, gt, train=train
        )
        if train:
            losses = dict(out)
            losses.update(rpn_losses)
            return losses
        return out


class GeneralizedRCNN_Context(nn.Module):
    """GeneralizedRCNN plus an auxiliary image-level multi-label BCE head
    (lvc rcnn.py:491-756: build_context:554, context_forward_train:578).
    Inference additionally returns per-image class scores."""

    backbone: nn.Module
    proposal_generator: Optional[nn.Module]
    roi_heads: nn.Module
    num_classes: int = 80
    context_channels: int = 256
    context_in_feature: str = "p5"
    images_only: bool = False
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)

    def setup(self):
        init = nn.initializers.normal(0.01)
        self.cont_conv = nn.Conv(
            self.context_channels, (1, 1), kernel_init=init, name="cont_conv"
        )
        self.cont_cls = nn.Dense(
            self.num_classes, use_bias=False, kernel_init=init, name="cont_cls"
        )

    def _context_logits(self, features):
        feat = features[self.context_in_feature]
        # the reference computes cont_conv(feat) but pools the RAW feature
        # (rcnn.py:596-598); keep the layer so checkpoints stay compatible
        _ = self.cont_conv(feat)
        x = jnp.max(feat, axis=(1, 2))  # adaptive max pool to 1x1
        x = nn.relu(x)
        return self.cont_cls(x)

    def __call__(self, batch: Dict[str, jnp.ndarray], *, train: bool = False):
        features = self.backbone(model_images(self, batch), train=train)
        image_sizes = batch["image_size"]

        if train:
            logits = self._context_logits(features)
            # image-level presence mask from gt
            cls = batch["gt_classes"]
            onehot = jax.nn.one_hot(cls, self.num_classes)
            mask = jnp.max(
                jnp.where(batch["gt_valid"][..., None], onehot, 0.0), axis=1
            )
            z = logits
            bce = jnp.maximum(z, 0) - z * mask + jnp.log1p(jnp.exp(-jnp.abs(z)))
            losses = {"loss_context": global_ratio(jnp.sum(bce), jnp.asarray(bce.size, jnp.float32))}
            if not self.images_only:
                proposals, _, prop_valid, rpn_losses = self.proposal_generator(
                    features, image_sizes, batch["gt_boxes"], batch["gt_valid"], train=True
                )
                gt = {
                    "boxes": batch["gt_boxes"],
                    "classes": batch["gt_classes"],
                    "valid": batch["gt_valid"],
                }
                if "gt_ignores" in batch:
                    gt["ignores"] = batch["gt_ignores"]
                roi_losses, _ = self.roi_heads(
                    features, proposals, prop_valid, image_sizes, gt, train=True
                )
                losses.update(roi_losses)
                losses.update(rpn_losses)
            return losses

        logits = self._context_logits(features)
        image_scores = jax.nn.sigmoid(logits)
        if self.images_only:
            return {"image_scores": image_scores}
        proposals, objectness, prop_valid, _ = self.proposal_generator(
            features, image_sizes, None, None, train=False
        )
        dets, _ = self.roi_heads(
            features, proposals, prop_valid, image_sizes, None, train=False
        )
        return {"detections": dets, "image_scores": image_scores}


class GeneralizedRCNNRegOnly(nn.Module):
    """Box-correction meta-arch (rcnn.py:336-410): inference regresses the
    candidate boxes carried in the batch's gt fields and returns corrected
    boxes aligned to the candidate slots. Training behaves like
    GeneralizedRCNN (with the RBG proposal source)."""

    backbone: nn.Module
    proposal_generator: Optional[nn.Module]
    roi_heads: nn.Module
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        return (images - mean) / std

    def __call__(self, batch: Dict[str, jnp.ndarray], *, train: bool = False):
        features = self.backbone(model_images(self, batch), train=train)
        image_sizes = batch["image_size"]

        if train:
            if self.proposal_generator is not None:
                proposals, objectness, prop_valid, rpn_losses = self.proposal_generator(
                    features,
                    image_sizes,
                    batch.get("gt_boxes"),
                    batch.get("gt_valid"),
                    train=True,
                    proposal_boxes=batch.get("proposal_boxes"),
                    proposal_logits=batch.get("proposal_logits"),
                    proposal_valid=batch.get("proposal_valid"),
                )
            else:
                proposals = batch["proposal_boxes"]
                prop_valid = batch["proposal_valid"]
                rpn_losses = {}
            gt = {
                "boxes": batch["gt_boxes"],
                "classes": batch["gt_classes"],
                "valid": batch["gt_valid"],
            }
            losses, _ = self.roi_heads(
                features, proposals, prop_valid, image_sizes, gt, train=True
            )
            losses.update(rpn_losses)
            return losses

        # inference: candidates = the gt boxes in the batch
        gt = {
            "boxes": batch["gt_boxes"],
            "classes": batch["gt_classes"],
            "valid": batch["gt_valid"],
        }
        out, _ = self.roi_heads(
            features,
            batch["gt_boxes"],
            batch["gt_valid"],
            image_sizes,
            gt,
            train=False,
            candidates_as_proposals=True,
        )
        return out


class ProposalNetwork(nn.Module):
    """RPN-only model for proposal extraction (rcnn.py:413-479)."""

    backbone: nn.Module
    proposal_generator: nn.Module
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)

    def __call__(self, batch: Dict[str, jnp.ndarray], *, train: bool = False):
        features = self.backbone(model_images(self, batch), train=train)
        proposals, objectness, valid, losses = self.proposal_generator(
            features,
            batch["image_size"],
            batch.get("gt_boxes"),
            batch.get("gt_valid"),
            train=train,
        )
        if train:
            return losses
        return {"proposal_boxes": proposals, "objectness_logits": objectness, "proposal_valid": valid}
