"""Swin Transformer backbone (flax, NHWC).

Counterpart of lvc/modeling/backbone/swin_transformer.py (window attention
:77, blocks :160, patch merging :262, SwinTransformer :447,
build_swin_transformer_fpn_backbone :671-734). Stage outputs are exposed
under the FPN-compatible names res2..res5 (strides 4..32) so the standard
FPN hooks up unchanged.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

SWIN_CONFIGS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
}


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, ws*ws, C); H, W divisible by ws."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + ws - 1
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
        Bn, N, C = x.shape
        H = self.num_heads
        hd = C // H
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(0, 1, 3, 2)) * (hd ** -0.5)
        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, H),
        )
        idx = relative_position_index(self.window_size).reshape(-1)
        bias = rpb_table[idx].reshape(N, N, H).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(Bn // nw, nw, H, N, N) + mask[None, :, None]
            attn = attn.reshape(Bn, H, N, N)
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        ws = self.window_size
        pad_h = (-H) % ws
        pad_w = (-W) % ws
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        y = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w

        mask = None
        if self.shift:
            y = jnp.roll(y, shift=(-self.shift, -self.shift), axis=(1, 2))
            mask = self._attn_mask(Hp, Wp)
        windows = window_partition(y, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws, name="attn")(windows, mask)
        y = window_reverse(attn, ws, Hp, Wp)
        if self.shift:
            y = jnp.roll(y, shift=(self.shift, self.shift), axis=(1, 2))
        y = y[:, :H, :W]
        x = shortcut + y
        z = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        z = nn.Dense(int(C * self.mlp_ratio), name="mlp.fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(C, name="mlp.fc2")(z)
        return x + z

    def _attn_mask(self, Hp: int, Wp: int) -> jnp.ndarray:
        ws, sh = self.window_size, self.shift
        img = np.zeros((1, Hp, Wp, 1), np.float32)
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
            for wsl in (slice(0, -ws), slice(-ws, -sh), slice(-sh, None)):
                img[:, hs, wsl] = cnt
                cnt += 1
        win = window_partition(jnp.asarray(img), ws).reshape(-1, ws * ws)
        diff = win[:, None, :] - win[:, :, None]
        return jnp.where(diff != 0, -100.0, 0.0)


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        pad_h, pad_w = H % 2, W % 2
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinTransformer(nn.Module):
    """Outputs {"res2": stride-4 ... "res5": stride-32} for FPN reuse."""

    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        out: Dict[str, jnp.ndarray] = {}
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            for b in range(depth):
                x = SwinBlock(
                    dim,
                    self.num_heads[stage],
                    self.window_size,
                    shift=0 if b % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio,
                    name=f"layers.{stage}.blocks.{b}",
                )(x)
            if stage in self.out_indices:
                feat = nn.LayerNorm(epsilon=1e-5, name=f"out_norm{stage}")(x)
                out[f"res{stage + 2}"] = feat
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"layers.{stage}.downsample")(x)
                dim *= 2
        return out


def build_swin_fpn_backbone(cfg):
    """build_swin_transformer_fpn_backbone analogue: Swin bottom-up + FPN."""
    from lvc_tpu.modeling.backbone.fpn import FPN

    params = SWIN_CONFIGS[cfg.MODEL.SWIN.SWIN_SIZE]
    bottom_up = SwinTransformer(
        embed_dim=params["embed_dim"],
        depths=tuple(params["depths"]),
        num_heads=tuple(params["num_heads"]),
        window_size=cfg.MODEL.SWIN.WINDOW_SIZE,
        patch_size=cfg.MODEL.SWIN.PATCH_SIZE,
        mlp_ratio=cfg.MODEL.SWIN.MLP_RATIO,
        out_indices=tuple(cfg.MODEL.SWIN.OUT_INDICES),
        name="bottom_up",
    )
    return FPN(
        bottom_up=bottom_up,
        in_features=("res2", "res3", "res4", "res5"),
        out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        norm=cfg.MODEL.FPN.NORM,
        fuse_type=cfg.MODEL.FPN.FUSE_TYPE,
        name="backbone",
    )
