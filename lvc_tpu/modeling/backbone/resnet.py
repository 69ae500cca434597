"""ResNet backbone (flax, NHWC, bf16-friendly).

Behavioral counterpart of detectron2/modeling/backbone/resnet.py
(BasicStem:564, BottleneckBlock:101, ResNet:648, build_resnet_backbone:846):
same topology, stride placement (STRIDE_IN_1X1), FrozenBN default, stage
freezing — but written TPU-first: NHWC layout for the MXU, no in-place
mutation, freezing expressed as optimizer masks (see solver.build) instead
of requires_grad flips.

Module/param naming intentionally mirrors the reference checkpoint layout
(stem.conv1, res{2..5}.{i}.conv{1..3}, shortcut) so weight conversion is a
mechanical rename (see lvc_tpu/checkpoint/convert.py).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from lvc_tpu.modeling.layers import Conv2d, max_pool_torch


class BasicStem(nn.Module):
    out_channels: int = 64
    norm: str = "FrozenBN"
    # exact space-to-depth stem conv (big MXU win on TPU); falls back to the
    # plain conv for odd input sizes
    space_to_depth: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # 12-channel input = loader-side space-to-depth (space_to_depth_host)
        s2d = x.shape[-1] == 12 or (
            self.space_to_depth and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        )
        x = Conv2d(
            self.out_channels,
            kernel_size=7,
            stride=2,
            padding=3,
            use_bias=False,
            norm=self.norm,
            activation=nn.relu,
            space_to_depth=s2d,
            name="conv1",
        )(x)
        x = max_pool_torch(x, kernel=3, stride=2, padding=1)
        return x


class BottleneckBlock(nn.Module):
    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    stride_in_1x1: bool = True
    dilation: int = 1
    has_shortcut: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        stride_1x1, stride_3x3 = (
            (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        )
        out = Conv2d(
            self.bottleneck_channels,
            kernel_size=1,
            stride=stride_1x1,
            use_bias=False,
            norm=self.norm,
            activation=nn.relu,
            name="conv1",
        )(x)
        out = Conv2d(
            self.bottleneck_channels,
            kernel_size=3,
            stride=stride_3x3,
            padding=self.dilation,
            dilation=self.dilation,
            groups=self.num_groups,
            use_bias=False,
            norm=self.norm,
            activation=nn.relu,
            name="conv2",
        )(out)
        if self.has_shortcut:
            shortcut = Conv2d(
                self.out_channels,
                kernel_size=1,
                stride=self.stride,
                use_bias=False,
                norm=self.norm,
                name="shortcut",
            )(x)
        else:
            shortcut = x
        # conv3 + folded BN + residual add + relu in one call: on the bf16
        # serving path this is a single fused Pallas GEMM (see Conv2d)
        out = Conv2d(
            self.out_channels,
            kernel_size=1,
            use_bias=False,
            norm=self.norm,
            activation=nn.relu,
            name="conv3",
        )(out, residual=shortcut, train=train)
        if self.dropout > 0:
            # BottleneckBlockDropout (resnet.py:214) — dropout after the add
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class BottleneckBlockCLIP(nn.Module):
    """CLIP/ResNet-D style bottleneck (reference resnet.py:326-446,
    selected by MODEL.RESNETS.D): all convs stride 1; downsampling happens
    by average pooling after conv2 on the main path and before the 1x1 on
    the shortcut."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    dilation: int = 1
    has_shortcut: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = Conv2d(
            self.bottleneck_channels, kernel_size=1, use_bias=False,
            norm=self.norm, activation=nn.relu, name="conv1",
        )(x)
        out = Conv2d(
            self.bottleneck_channels, kernel_size=3, padding=self.dilation,
            dilation=self.dilation, groups=self.num_groups, use_bias=False,
            norm=self.norm, activation=nn.relu, name="conv2",
        )(out)
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride), (self.stride, self.stride))
        if self.has_shortcut:
            sc = x
            if self.stride > 1:
                sc = nn.avg_pool(sc, (self.stride, self.stride), (self.stride, self.stride))
            shortcut = Conv2d(
                self.out_channels, kernel_size=1, use_bias=False,
                norm=self.norm, name="shortcut",
            )(sc)
        else:
            shortcut = x
        return Conv2d(
            self.out_channels, kernel_size=1, use_bias=False, norm=self.norm,
            activation=nn.relu, name="conv3",
        )(out, residual=shortcut, train=train)


class DeformBottleneckBlock(nn.Module):
    """Bottleneck with a deformable 3x3 (reference resnet.py:447,
    DEFORM_ON_PER_STAGE); the offset-predicting conv starts at zero so the
    block begins as a plain bottleneck."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    norm: str = "FrozenBN"
    stride_in_1x1: bool = True
    dilation: int = 1
    has_shortcut: bool = False
    deform_modulated: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from lvc_tpu.modeling.layers import get_norm
        from lvc_tpu.ops.deform_conv import DeformConv

        stride_1x1, stride_3x3 = (
            (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        )
        out = Conv2d(
            self.bottleneck_channels, kernel_size=1, stride=stride_1x1,
            use_bias=False, norm=self.norm, activation=nn.relu, name="conv1",
        )(x)
        out = DeformConv(
            features=self.bottleneck_channels, kernel_size=3, stride=stride_3x3,
            padding=self.dilation, dilation=self.dilation,
            modulated=self.deform_modulated, name="conv2",
        )(out)
        norm2 = get_norm(self.norm, self.bottleneck_channels)
        if norm2 is not None:
            out = norm2(out)
        out = nn.relu(out)
        if self.has_shortcut:
            shortcut = Conv2d(
                self.out_channels, kernel_size=1, stride=self.stride,
                use_bias=False, norm=self.norm, name="shortcut",
            )(x)
        else:
            shortcut = x
        return Conv2d(
            self.out_channels, kernel_size=1, use_bias=False, norm=self.norm,
            activation=nn.relu, name="conv3",
        )(out, residual=shortcut, train=train)


class ResNet(nn.Module):
    """Returns a dict of stage outputs {"res2": ..., ..., "res5": ...}
    restricted to ``out_features``."""

    # the BasicStem consumes loader-side space-to-depth input (12-channel
    # image_s2d batches); non-ResNet backbones (Swin, ViT) do not
    supports_s2d_input = True

    depth: int = 50
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    stride_in_1x1: bool = True
    res5_dilation: int = 1
    norm: str = "FrozenBN"
    out_features: Sequence[str] = ("res4",)
    dropout: float = 0.0
    clip_block: bool = False  # MODEL.RESNETS.D: CLIP/ResNet-D bottleneck
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    # rematerialize each block on the backward pass (jax.checkpoint):
    # trades ~25% extra forward FLOPs for not storing per-block
    # activations — the standard HBM lever for detector training
    remat: bool = False

    @staticmethod
    def stage_blocks(depth: int) -> List[int]:
        return {
            18: [2, 2, 2, 2],
            34: [3, 4, 6, 3],
            50: [3, 4, 6, 3],
            101: [3, 4, 23, 3],
            152: [3, 8, 36, 3],
        }[depth]

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        assert self.depth in (50, 101, 152), "only bottleneck ResNets supported"
        blocks_per_stage = self.stage_blocks(self.depth)
        x = BasicStem(self.stem_out_channels, norm=self.norm, name="stem")(x)

        out: Dict[str, jnp.ndarray] = {}
        if "stem" in self.out_features:
            out["stem"] = x

        out_channels = self.res2_out_channels
        bottleneck_channels = self.num_groups * self.width_per_group
        in_channels = self.stem_out_channels

        max_stage = max(
            [int(f[len("res") :]) for f in self.out_features if f.startswith("res")],
            default=5,
        )
        for idx, stage_idx in enumerate(range(2, 6)):
            if stage_idx > max_stage:
                break
            dilation = self.res5_dilation if stage_idx == 5 else 1
            first_stride = 1 if idx == 0 or (stage_idx == 5 and dilation == 2) else 2
            stage_name = f"res{stage_idx}"
            for b in range(blocks_per_stage[idx]):
                common = dict(
                    out_channels=out_channels,
                    bottleneck_channels=bottleneck_channels,
                    stride=first_stride if b == 0 else 1,
                    num_groups=self.num_groups,
                    norm=self.norm,
                    dilation=dilation,
                    has_shortcut=(b == 0),
                    name=f"{stage_name}.{b}",
                )
                if self.clip_block:
                    cls = BottleneckBlockCLIP
                    kwargs = {}
                elif self.deform_on_per_stage[idx]:
                    cls = DeformBottleneckBlock
                    kwargs = dict(
                        stride_in_1x1=self.stride_in_1x1,
                        deform_modulated=self.deform_modulated,
                    )
                else:
                    cls = BottleneckBlock
                    kwargs = dict(
                        stride_in_1x1=self.stride_in_1x1,
                        dropout=self.dropout,
                    )
                if self.remat and train:
                    cls = nn.remat(cls, static_argnums=(2,))
                block = cls(**common, **kwargs)
                x = block(x, train)
            if stage_name in self.out_features:
                out[stage_name] = x
            in_channels = out_channels
            out_channels *= 2
            bottleneck_channels *= 2
        return out


# stage name -> (stride, channels) for a standard ResNet-50/101
RESNET_STAGE_STRIDES = {"stem": 4, "res2": 4, "res3": 8, "res4": 16, "res5": 32}


def resnet_out_channels(depth: int, res2_out: int = 256) -> Dict[str, int]:
    return {
        "res2": res2_out,
        "res3": res2_out * 2,
        "res4": res2_out * 4,
        "res5": res2_out * 8,
    }


def build_resnet(cfg) -> ResNet:
    """Config-driven constructor mirroring build_resnet_backbone
    (resnet.py:846)."""
    return ResNet(
        depth=cfg.MODEL.RESNETS.DEPTH,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        res5_dilation=cfg.MODEL.RESNETS.RES5_DILATION,
        norm=cfg.MODEL.RESNETS.NORM,
        out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
        dropout=cfg.MODEL.RESNETS.DROPOUT,
        clip_block=cfg.MODEL.RESNETS.D,
        deform_on_per_stage=tuple(cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE),
        deform_modulated=cfg.MODEL.RESNETS.DEFORM_MODULATED,
        remat=cfg.MODEL.BACKBONE.REMAT,
        name="bottom_up",
    )
