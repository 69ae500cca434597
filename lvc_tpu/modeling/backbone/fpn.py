"""Feature Pyramid Network (flax, NHWC).

Counterpart of detectron2/modeling/backbone/fpn.py (FPN:16,
LastLevelMaxPool:165, build_resnet_fpn_backbone:202). Top-down pathway with
nearest-neighbor 2x upsampling, 1x1 lateral + 3x3 output convs, optional p6
via stride-2 pool. Returns {"p2": ..., "p6": ...}.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import flax.linen as nn

from lvc_tpu.modeling.layers import Conv2d
from lvc_tpu.modeling.backbone.resnet import ResNet, build_resnet, RESNET_STAGE_STRIDES


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    bottom_up: nn.Module
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    out_channels: int = 256
    norm: str = ""
    fuse_type: str = "sum"
    top_block: str = "maxpool"  # "maxpool" => p6; "p6p7" => p6+p7; "" => none
    p6p7_from_res5: bool = True  # LastLevelP6P7 input (res5 vs p5)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        bottom_up_features = self.bottom_up(x, train=train)
        feats = [bottom_up_features[f] for f in self.in_features]  # low->high stride

        # lateral/output convs are named by stage stride like the reference
        # (fpn_lateral2, fpn_output2, ...)
        stage_ids = [int(f[len("res") :]) for f in self.in_features]

        results = {}
        prev = None
        for f, sid in reversed(list(zip(feats, stage_ids))):
            lateral_conv = Conv2d(
                self.out_channels,
                kernel_size=1,
                use_bias=(self.norm == ""),
                norm=self.norm,
                name=f"fpn_lateral{sid}",
            )
            if prev is not None and self.fuse_type == "sum":
                # lateral + top-down as the conv's fused residual: one
                # Pallas GEMM on the bf16 TPU serving path (see Conv2d)
                lateral = lateral_conv(
                    f, residual=upsample_nearest_2x(prev), train=train
                )
            else:
                lateral = lateral_conv(f)
                if prev is not None:
                    lateral = lateral + upsample_nearest_2x(prev)
                    if self.fuse_type == "avg":
                        lateral = lateral / 2.0
            prev = lateral
            results[f"p{sid}"] = Conv2d(
                self.out_channels,
                kernel_size=3,
                padding=1,
                use_bias=(self.norm == ""),
                norm=self.norm,
                name=f"fpn_output{sid}",
            )(lateral)

        if self.top_block == "maxpool":
            # LastLevelMaxPool (fpn.py:165): kernel 1, stride 2
            top_sid = max(stage_ids) + 1
            results[f"p{top_sid}"] = results[f"p{max(stage_ids)}"][:, ::2, ::2, :]
        elif self.top_block == "p6p7":
            # LastLevelP6P7 (fpn.py:180): stride-2 convs off res5/p5 for
            # RetinaNet-style pyramids.
            top_sid = max(stage_ids)
            src = bottom_up_features[f"res{top_sid}"] if self.p6p7_from_res5 else results[f"p{top_sid}"]
            p6 = Conv2d(
                self.out_channels, kernel_size=3, stride=2, padding=1, name="top_block_p6"
            )(src)
            p7 = Conv2d(
                self.out_channels, kernel_size=3, stride=2, padding=1, name="top_block_p7"
            )(nn.relu(p6))
            results[f"p{top_sid + 1}"] = p6
            results[f"p{top_sid + 2}"] = p7
        return results


def fpn_strides(in_features: Sequence[str], top_block: str = "maxpool") -> Dict[str, int]:
    stage_ids = [int(f[len("res") :]) for f in in_features]
    strides = {f"p{s}": 2 ** s for s in stage_ids}
    if top_block == "maxpool":
        strides[f"p{max(stage_ids) + 1}"] = 2 ** (max(stage_ids) + 1)
    elif top_block == "p6p7":
        strides[f"p{max(stage_ids) + 1}"] = 2 ** (max(stage_ids) + 1)
        strides[f"p{max(stage_ids) + 2}"] = 2 ** (max(stage_ids) + 2)
    return strides


def build_resnet_fpn_backbone(cfg) -> FPN:
    bottom_up = build_resnet(cfg)
    return FPN(
        bottom_up=bottom_up,
        in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        norm=cfg.MODEL.FPN.NORM,
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        name="backbone",
    )
