"""RPNComp: bare backbone descriptor extractor.

Counterpart of lvc/modeling/meta_arch/rpn_comp.py:15-72 — extracts a
pooled ``res5`` feature per image for patch-vs-shots comparison. The
pooler is adaptive avg / max / identity per ``MODEL.RPNCOMP.POOLER``.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import flax.linen as nn


class RPNComp(nn.Module):
    """backbone -> res5 -> global pool -> (B, C) descriptors."""

    backbone: nn.Module
    pooler: str = "avg"  # 'avg' | 'max' | 'identity'
    out_feature: str = "res5"
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)

    def __call__(self, batch: Dict[str, jnp.ndarray], *, train: bool = False):
        assert not train, "RPNComp is inference-only (rpn_comp.py:51)"
        from lvc_tpu.modeling.meta_arch.rcnn import model_images

        features = self.backbone(model_images(self, batch), train=False)
        x = features[self.out_feature]  # (B, H, W, C)
        if self.pooler == "avg":
            return jnp.mean(x, axis=(1, 2))
        if self.pooler == "max":
            return jnp.max(x, axis=(1, 2))
        return x
