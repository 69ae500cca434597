"""Deformable convolution v1/v2 as XLA bilinear-gather + matmul.

TPU-native counterpart of detectron2/layers/csrc/deformable/* (DCN im2col
CUDA kernels) and the ``DeformConv``/``ModulatedDeformConv`` wrappers
(detectron2/layers/deform_conv.py:308+). Instead of a hand-written im2col
kernel, sampling positions (base k-grid + learned offsets) are evaluated
with a vectorized bilinear gather — XLA fuses the weight multiply and the
(N*H*W, K*K*C) x (K*K*C, F) contraction lands on the MXU. Autodiff gives
the backward pass for free (the reference ships ~2.4k LoC of CUDA for it).

``RESNETS.DEFORM_ON_PER_STAGE`` exists in the config but no shipped LVC
config enables it (SURVEY.md §2.2: stretch goal) — this implements the
surface completely.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def _bilinear_sample(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """img: (H, W, C); y/x: (...) float sample positions. Zero outside."""
    H, W = img.shape[:2]
    inside = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)
    y = jnp.clip(y, 0.0, H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    out = (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )
    return jnp.where(inside[..., None], out, 0.0)


def deform_conv2d(
    x: jnp.ndarray,  # (N, H, W, C)
    offsets: jnp.ndarray,  # (N, Ho, Wo, 2*K*K) (dy, dx) interleaved per tap
    weight: jnp.ndarray,  # (K, K, C, F)
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    mask: jnp.ndarray | None = None,  # (N, Ho, Wo, K*K) modulation (DCNv2)
) -> jnp.ndarray:
    """Deformable conv forward. Output (N, Ho, Wo, F) where
    Ho = (H + 2*padding - dilation*(K-1) - 1)//stride + 1."""
    N, H, W, C = x.shape
    K = weight.shape[0]
    Ho = (H + 2 * padding - dilation * (K - 1) - 1) // stride + 1
    Wo = (W + 2 * padding - dilation * (K - 1) - 1) // stride + 1

    # base sampling grid: output pixel -> K*K input taps
    oy = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(K, dtype=jnp.float32) * dilation
    kx = jnp.arange(K, dtype=jnp.float32) * dilation
    base_y = oy[:, None, None, None] + ky[None, None, :, None]  # (Ho,1,K,1)
    base_x = ox[None, :, None, None] + kx[None, None, None, :]  # (1,Wo,1,K)
    base_y = jnp.broadcast_to(base_y, (Ho, Wo, K, K)).reshape(Ho, Wo, K * K)
    base_x = jnp.broadcast_to(base_x, (Ho, Wo, K, K)).reshape(Ho, Wo, K * K)

    off = offsets.reshape(N, Ho, Wo, K * K, 2)
    sy = base_y[None] + off[..., 0]
    sx = base_x[None] + off[..., 1]

    def per_image(img, yy, xx, mm):
        vals = _bilinear_sample(img, yy, xx)  # (Ho, Wo, K*K, C)
        if mm is not None:
            vals = vals * mm[..., None]
        cols = vals.reshape(Ho, Wo, K * K * C)
        w = weight.reshape(K * K * C, -1)
        return jnp.dot(cols, w, preferred_element_type=jnp.float32).astype(x.dtype)

    if mask is None:
        return jax.vmap(lambda i, yy, xx: per_image(i, yy, xx, None))(x, sy, sx)
    return jax.vmap(per_image)(x, sy, sx, mask)


class DeformConv(nn.Module):
    """DCNv1 layer: a plain conv predicts offsets, the deformable gather
    applies them (deform_conv.py:308 wrapper semantics; offsets initialized
    to zero so it starts as a regular conv)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    modulated: bool = False  # DCNv2 (modulated_deform_conv)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        K = self.kernel_size
        n_off = 2 * K * K + (K * K if self.modulated else 0)
        off = nn.Conv(
            n_off,
            (K, K),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_dilation=(self.dilation, self.dilation),
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="offset_conv",
        )(x)
        if self.modulated:
            offsets, mask_logits = off[..., : 2 * K * K], off[..., 2 * K * K :]
            mask = 2.0 * jax.nn.sigmoid(mask_logits)  # DCNv2 modulation in [0, 2]
        else:
            offsets, mask = off, None
        weight = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (K, K, x.shape[-1], self.features),
        )
        return deform_conv2d(
            x, offsets, weight, self.stride, self.padding, self.dilation, mask
        )
