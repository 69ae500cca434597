"""Panoptic FPN meta-architecture.

Behavioral counterpart of the vendored
``detectron2/modeling/meta_arch/panoptic_fpn.py`` (218 LoC): a
GeneralizedRCNN instance branch plus a SemSegFPNHead stuff branch over the
shared FPN, trained jointly (instance losses scaled by
``instance_loss_weight``), with the panoptic combine step as host-side
post-processing (``combine_semantic_and_instance_outputs``) — it is
sequential, data-dependent logic that belongs off-device, exactly like the
reference runs it on CPU tensors after inference.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from lvc_tpu.modeling.meta_arch.semantic_seg import SemSegFPNHead


class PanopticFPN(nn.Module):
    """Shared backbone -> {RPN -> ROI heads, SemSegFPNHead}."""

    backbone: nn.Module
    proposal_generator: nn.Module
    roi_heads: nn.Module
    sem_seg_head: SemSegFPNHead
    instance_loss_weight: float = 1.0
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        return (images - mean) / std

    def __call__(self, batch: Dict[str, jnp.ndarray], *, train: bool = False):
        from lvc_tpu.modeling.meta_arch.rcnn import model_images

        features = self.backbone(model_images(self, batch), train=train)
        image_sizes = batch["image_size"]

        sem_logits = self.sem_seg_head(features)

        gt_boxes = batch.get("gt_boxes")
        gt_valid = batch.get("gt_valid")
        proposals, objectness, prop_valid, rpn_losses = self.proposal_generator(
            features, image_sizes, gt_boxes, gt_valid, train=train
        )

        gt = None
        if train:
            gt = {
                "boxes": batch["gt_boxes"],
                "classes": batch["gt_classes"],
                "valid": batch["gt_valid"],
            }
            if "gt_masks" in batch:
                gt["masks"] = batch["gt_masks"]
        out, aux = self.roi_heads(
            features, proposals, prop_valid, image_sizes, gt, train=train
        )

        if train:
            losses = self.sem_seg_head.losses(sem_logits, batch["sem_seg"])
            losses.update(
                {k: v * self.instance_loss_weight for k, v in {**out, **rpn_losses}.items()}
            )
            return losses
        return {"instances": out, "sem_seg": sem_logits}


def combine_semantic_and_instance_outputs(
    boxes: np.ndarray,
    scores: np.ndarray,
    classes: np.ndarray,
    valid: np.ndarray,
    masks: np.ndarray,
    semantic_logits: np.ndarray,
    overlap_threshold: float = 0.5,
    stuff_area_limit: int = 4096,
    instances_confidence_threshold: float = 0.5,
):
    """Host-side panoptic fusion (panoptic_fpn.py:121-218 semantics).

    Args:
        masks: (D, H, W) bool instance masks pasted to image resolution.
        semantic_logits: (H, W, C_stuff) from the sem seg head.
    Returns:
        panoptic_seg (H, W) int32 segment ids (0 = unassigned) and a list of
        segment-info dicts (same schema as the reference).
    """
    H, W = semantic_logits.shape[:2]
    panoptic = np.zeros((H, W), np.int32)
    segments = []
    current_id = 0

    order = np.argsort(-scores)
    for i in order:
        if not valid[i] or scores[i] < instances_confidence_threshold:
            continue
        mask = masks[i].astype(bool)
        area = int(mask.sum())
        if area == 0:
            continue
        intersect = int((mask & (panoptic > 0)).sum())
        if intersect * 1.0 / area > overlap_threshold:
            continue
        if intersect > 0:
            mask = mask & (panoptic == 0)
        current_id += 1
        panoptic[mask] = current_id
        segments.append(
            {
                "id": current_id,
                "isthing": True,
                "score": float(scores[i]),
                "category_id": int(classes[i]),
                "instance_id": int(i),
            }
        )

    semantic = np.argmax(semantic_logits, axis=-1)
    for cat in np.unique(semantic):
        if cat == 0:  # 0 is the "thing" placeholder in d2 stuff maps
            continue
        mask = (semantic == cat) & (panoptic == 0)
        if int(mask.sum()) < stuff_area_limit:
            continue
        current_id += 1
        panoptic[mask] = current_id
        segments.append(
            {
                "id": current_id,
                "isthing": False,
                "category_id": int(cat),
                "area": int(mask.sum()),
            }
        )
    return panoptic, segments
