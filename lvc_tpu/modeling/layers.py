"""Neural-net building blocks shared across the detector (flax, NHWC).

TPU-native counterpart of detectron2/layers/{batch_norm.py,wrappers.py}:
FrozenBatchNorm folds to a scale/bias affine at trace time; convs use
explicit torch-style symmetric padding so activations match the reference
checkpoints spatially.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

# ---------------------------------------------------------------------------
# Global compute dtype for conv/dense math (mixed precision).
#
# Params stay float32; when set to bfloat16, flax casts inputs+kernels to
# bf16 inside each conv/dense so the MXU runs at its bf16 rate, and the
# heads cast their outputs back to f32 before any box decode / NMS / loss
# (coordinate math must not run in bf16: 8 mantissa bits = multi-pixel
# error at image scale). Set from cfg.MODEL.DTYPE in build_model; read at
# trace time, so each jit of a model apply picks up the current setting.
# ---------------------------------------------------------------------------
_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype)


def get_compute_dtype():
    return _COMPUTE_DTYPE


class FrozenBatchNorm(nn.Module):
    """BatchNorm with constant affine + stats (detectron2 FrozenBatchNorm2d,
    layers/batch_norm.py:14). Stats live in the ``batch_stats`` collection so
    checkpoint conversion keeps the reference layout; math folds to a single
    fused multiply-add under XLA."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "running_mean", nn.initializers.zeros, None, (self.features,)
        )
        var = self.variable(
            "batch_stats", "running_var", nn.initializers.ones, None, (self.features,)
        )
        # fold in f32, apply in the activation dtype (keeps bf16 activations
        # bf16 instead of promoting the whole backbone back to f32)
        scale = weight * jax.lax.rsqrt(var.value + self.eps)
        shift = bias - mean.value * scale
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


class SyncBatchNorm(nn.Module):
    """Cross-replica BatchNorm: the reference's NaiveSyncBatchNorm
    (layers/batch_norm.py:168) hand-rolls an AllReduce of moments; here a
    ``psum`` over the data axis does it natively when inside shard_map/pjit."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.9
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "running_mean", nn.initializers.zeros, None, (self.features,)
        )
        ra_var = self.variable(
            "batch_stats", "running_var", nn.initializers.ones, None, (self.features,)
        )
        if train:
            mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)))
            mean2 = jnp.mean(jnp.square(x), axis=tuple(range(x.ndim - 1)))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
            var = mean2 - jnp.square(mean)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        scale = weight * jax.lax.rsqrt(var + self.eps)
        return x * scale + (bias - mean * scale)


class GroupNorm(nn.GroupNorm):
    pass


def get_norm(norm: str, features: int) -> Optional[nn.Module]:
    """Norm factory matching d2's get_norm names (layers/batch_norm.py:97)."""
    if not norm:
        return None
    if norm == "FrozenBN":
        return FrozenBatchNorm(features)
    if norm in ("BN", "SyncBN", "naiveSyncBN"):
        return SyncBatchNorm(features)
    if norm == "GN":
        return nn.GroupNorm(num_groups=32)
    raise ValueError(f"Unknown norm: {norm}")


class Conv2d(nn.Module):
    """Conv with torch-style explicit symmetric padding + optional norm and
    activation (mirrors d2's Conv2d wrapper, layers/wrappers.py)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    norm: str = ""
    activation: Optional[Callable] = None
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.padding
        kwargs = {}
        if self.kernel_init is not None:
            kwargs["kernel_init"] = self.kernel_init
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=get_compute_dtype(),
            name="conv",
            **kwargs,
        )(x)
        norm = get_norm(self.norm, self.features)
        if norm is not None:
            x = norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class ASPP(nn.Module):
    """Atrous Spatial Pyramid Pooling (detectron2/layers/aspp.py:12):
    parallel 1x1 + three dilated 3x3 convs + global-pool branch, fused by a
    1x1 projection. On TPU the five branches are independent MXU convs XLA
    schedules concurrently; the pooling branch broadcasts instead of
    resizing (exact for the train-size-free case)."""

    features: int
    dilations: Sequence[int] = (6, 12, 18)
    norm: str = ""
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        branches = [
            Conv2d(self.features, 1, use_bias=(self.norm == ""), norm=self.norm,
                   activation=nn.relu, name="conv1x1")(x)
        ]
        for i, d in enumerate(self.dilations):
            branches.append(
                Conv2d(
                    self.features, 3, padding=d, dilation=d,
                    use_bias=(self.norm == ""), norm=self.norm,
                    activation=nn.relu, name=f"conv3x3_{i}",
                )(x)
            )
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = Conv2d(self.features, 1, activation=nn.relu, name="pool_conv")(pooled)
        branches.append(jnp.broadcast_to(pooled, branches[0].shape))
        y = jnp.concatenate(branches, axis=-1)
        y = Conv2d(self.features, 1, use_bias=(self.norm == ""), norm=self.norm,
                   activation=nn.relu, name="project")(y)
        if self.dropout > 0 and train:
            y = nn.Dropout(self.dropout, deterministic=False)(y)
        return y


def max_pool_torch(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    """Max-pool with torch-style symmetric padding (pads with -inf)."""
    return nn.max_pool(
        x,
        window_shape=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )
