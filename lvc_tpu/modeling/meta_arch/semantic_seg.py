"""Semantic segmentation meta-architecture (flax, fixed-shape).

Behavioral counterpart of the vendored
``detectron2/modeling/meta_arch/semantic_seg.py`` (SemanticSegmentor,
SemSegFPNHead): each FPN level runs log2(stride/common_stride) conv-GN-ReLU
+ 2x-upsample blocks down to the common stride, the branches are summed,
a 1x1 predictor emits per-pixel class logits, and the map is upsampled to
input resolution. Loss is pixel cross-entropy with an ignore value. All
shapes static; the ignore mask doubles as the padding mask.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from lvc_tpu.modeling.sampling import global_ratio
import flax.linen as nn


def upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsampling (d2 uses F.interpolate(bilinear))."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * 2, W * 2, C), method="bilinear")


class SemSegFPNHead(nn.Module):
    """FPN semantic head (semantic_seg.py:78-184)."""

    in_features: Sequence[str]
    strides: Dict[str, int]
    num_classes: int = 54
    convs_dim: int = 128
    common_stride: int = 4
    norm: str = "GN"
    ignore_value: int = 255
    loss_weight: float = 1.0

    @nn.compact
    def __call__(self, features: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        from lvc_tpu.modeling.layers import Conv2d

        import math

        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")  # msra
        summed = None
        for f in self.in_features:
            x = features[f]
            stride = self.strides[f]
            num_blocks = max(1, int(math.log2(stride) - math.log2(self.common_stride)))
            for k in range(num_blocks):
                x = Conv2d(
                    self.convs_dim,
                    3,
                    padding=1,
                    use_bias=not self.norm,
                    norm=self.norm,
                    kernel_init=init,
                    name=f"{f}_conv{k}",
                )(x)
                x = nn.relu(x)
                if stride != self.common_stride:
                    x = upsample_2x(x)
                    stride //= 2
            summed = x if summed is None else summed + x
        logits = Conv2d(
            self.num_classes, 1, kernel_init=nn.initializers.normal(0.01), name="predictor"
        )(summed)
        # upsample to input resolution (common_stride x)
        B, H, W, C = logits.shape
        s = self.common_stride
        logits = jax.image.resize(
            logits.astype(jnp.float32), (B, H * s, W * s, C), method="bilinear"
        )
        return logits

    def losses(self, logits: jnp.ndarray, targets: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Pixel CE, mean over non-ignored pixels (semantic_seg.py:174-184).
        targets: (B, H, W) int32 with ignore_value for void/padding."""
        valid = targets != self.ignore_value
        safe = jnp.clip(targets, 0, self.num_classes - 1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        loss = global_ratio(jnp.sum(jnp.where(valid, ce, 0.0)), jnp.sum(valid))
        return {"loss_sem_seg": loss * self.loss_weight}


class SemanticSegmentor(nn.Module):
    """backbone -> SemSegFPNHead (semantic_seg.py:24-76).

    Batch contract: ``image``/``image_size`` as GeneralizedRCNN; training
    additionally needs ``sem_seg`` (B, H, W) int32 targets padded with the
    head's ignore value.
    """

    backbone: nn.Module
    sem_seg_head: SemSegFPNHead
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, images.dtype)
        std = jnp.asarray(self.pixel_std, images.dtype)
        return (images - mean) / std

    def __call__(self, batch: Dict[str, jnp.ndarray], *, train: bool = False):
        from lvc_tpu.modeling.meta_arch.rcnn import model_images

        features = self.backbone(model_images(self, batch), train=train)
        logits = self.sem_seg_head(features)
        if train:
            return self.sem_seg_head.losses(logits, batch["sem_seg"])
        return logits
