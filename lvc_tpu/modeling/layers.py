"""Neural-net building blocks shared across the detector (flax, NHWC).

TPU-native counterpart of detectron2/layers/{batch_norm.py,wrappers.py}:
FrozenBatchNorm folds to a scale/bias affine at trace time; convs use
explicit torch-style symmetric padding so activations match the reference
checkpoints spatially.
"""
from __future__ import annotations

import os
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


class compute_dtype_scope:
    """Temporarily switch the compute dtype (read at TRACE time): used by
    the mixed-precision train step to trace its forward in bf16 while the
    build-time default stays f32 for eval."""

    def __init__(self, dtype):
        self._dtype = jnp.dtype(dtype)

    def __enter__(self):
        global _COMPUTE_DTYPE
        self._saved = _COMPUTE_DTYPE
        _COMPUTE_DTYPE = self._dtype
        return self

    def __exit__(self, *exc):
        global _COMPUTE_DTYPE
        _COMPUTE_DTYPE = self._saved
        return False


class FrozenBatchNorm(nn.Module):
    """BatchNorm with constant affine + stats (detectron2 FrozenBatchNorm2d,
    layers/batch_norm.py:14). Stats live in the ``batch_stats`` collection so
    checkpoint conversion keeps the reference layout; math folds to a single
    fused multiply-add under XLA."""

    features: int
    eps: float = 1e-5

    def setup(self):
        self.weight = self.param("weight", nn.initializers.ones, (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros, (self.features,))
        self.running_mean = self.variable(
            "batch_stats", "running_mean", nn.initializers.zeros, None, (self.features,)
        )
        self.running_var = self.variable(
            "batch_stats", "running_var", nn.initializers.ones, None, (self.features,)
        )

    def folded(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """The affine this BN folds to: ``x * scale + shift`` in f32."""
        scale = self.weight * jax.lax.rsqrt(self.running_var.value + self.eps)
        shift = self.bias - self.running_mean.value * scale
        return scale, shift

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # fold in f32, apply in the activation dtype (keeps bf16 activations
        # bf16 instead of promoting the whole backbone back to f32)
        scale, shift = self.folded()
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


class _KernelHolder(nn.Module):
    """Owns a conv kernel (and optionally bias) param at the same paths
    nn.Conv would use, for layers that apply the kernel through a
    transformed computation."""

    shape: Tuple[int, ...]
    kernel_init: Callable
    bias_features: int = 0
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init, self.shape)
        if self.bias_features:
            bias = self.param("bias", self.bias_init, (self.bias_features,))
            return kernel, bias
        return kernel


def space_to_depth_host(
    img: "np.ndarray", pixel_mean, pixel_std
) -> "np.ndarray":
    """Host-side (numpy) input-pipeline half of the space-to-depth stem:
    normalize, pad 3 px, 2x2 space-to-depth. Returns
    ``((H+6)/2, (W+6)/2, 4*C)`` float32 with channel order (row parity,
    col parity, C) — exactly what :func:`space_to_depth_conv` builds on
    device. Moving this into the data loader removes ~8 ms/step of XLA
    relayout (pad/reshape/copy on a lane=3 image tensor) from the device
    hot path; the loader overlaps it with device compute. Works on (H, W, C)
    or batched (B, H, W, C) arrays.
    """
    import numpy as np

    batched = img.ndim == 4
    x = np.asarray(img)
    if not batched:
        x = x[None]
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, "space_to_depth_host needs even H, W"
    mean = np.asarray(pixel_mean, np.float32)
    std = np.asarray(pixel_std, np.float32)
    Hp, Wp = H + 6, W + 6
    # one output allocation; each (row-parity, col-parity) slot is a strided
    # quarter-size normalize-copy (the naive normalize -> pad -> transpose
    # chain costs three full-size copies and dominated the host pipeline).
    # zeros outside the valid region == the pad value in normalized space.
    out = np.zeros((B, Hp // 2, Wp // 2, 4 * C), np.float32)
    for p in range(2):
        for q in range(2):
            # padded coords (2i + p, 2j + q) map to source (2i + p - 3,
            # 2j + q - 3); first valid i/j where the source index >= 0
            i0 = (3 - p + 1) // 2
            j0 = (3 - q + 1) // 2
            r0 = 2 * i0 + p - 3
            c0 = 2 * j0 + q - 3
            src = x[:, r0:H:2, c0:W:2]
            sl = slice((p * 2 + q) * C, (p * 2 + q) * C + C)
            dst = out[:, i0 : i0 + src.shape[1], j0 : j0 + src.shape[2], sl]
            # divide (not multiply-by-reciprocal): bitwise identical to the
            # composed normalize -> pad -> space-to-depth reference, which
            # the loader-vs-device equivalence tests pin exactly
            np.divide(np.subtract(src, mean, dtype=np.float32), std, out=dst)
    return out if batched else out[0]


def space_to_depth_conv(
    x: jnp.ndarray, kernel: jnp.ndarray, dtype, pre_transformed: bool = False
) -> jnp.ndarray:
    """7x7 stride-2 pad-3 conv computed as a 4x4 stride-1 conv on the 2x2
    space-to-depth transform of the input — mathematically exact, and maps
    far better onto the MXU (12 input channels instead of 3, quarter the
    spatial positions). The standard TPU detection "conv0 space-to-depth"
    trick; the stored parameter stays the plain (7, 7, Cin, F) kernel.

    Derivation: with x' = pad(x, 3) and u = 2a + p,
    y[i, j] = sum_{u,v} K[u, v] x'[2i+u, 2j+v]
            = sum_{a,b,p,q} K8[2a+p, 2b+q] X[i+a, j+b, (p, q)]
    where K8 zero-pads K to 8x8 and X is the 2x2 space-to-depth of x'.
    Requires even input height/width (detector canvases are stride-padded).
    """
    K, _, Cin, F = kernel.shape
    assert K == 7
    if pre_transformed:
        # input already normalized+padded+space-to-depth'd by the loader
        assert x.shape[-1] == 4 * Cin, (x.shape, kernel.shape)
        X = x
    else:
        B, H, W, _ = x.shape
        assert H % 2 == 0 and W % 2 == 0, "space-to-depth stem needs even H, W"
        xp = jnp.pad(x.astype(dtype), ((0, 0), (3, 3), (3, 3), (0, 0)))
        Hp, Wp = H + 6, W + 6
        X = (
            xp.reshape(B, Hp // 2, 2, Wp // 2, 2, Cin)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, Hp // 2, Wp // 2, 4 * Cin)
        )
    # kernel channel order must match the slice concat: (row par, col par, Cin)
    k8 = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (8, 8, Cin, F)
    k4 = (
        k8.reshape(4, 2, 4, 2, Cin, F)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * Cin, F)
    )
    return jax.lax.conv_general_dilated(
        X.astype(dtype),
        k4.astype(dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )


class Conv2d(nn.Module):
    """Conv with torch-style explicit symmetric padding + optional norm and
    activation (mirrors d2's Conv2d wrapper, layers/wrappers.py).

    ``__call__(x, residual=...)`` computes ``act(norm(conv(x)) + residual)``
    — the bottleneck-tail pattern. On the bf16 TPU serving path a 1x1
    no-bias FrozenBN conv with a residual runs as one fused Pallas GEMM
    whose epilogue applies the folded affine, the add, and the ReLU while
    the tile is in VMEM (ops/fused_matmul.py), eliminating the residual
    add's HBM round-trip; everywhere else the same math runs as separate
    XLA ops."""

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
    bias_init: Optional[Callable] = None
    # exact space-to-depth computation for 7x7/s2/p3 stems (see
    # space_to_depth_conv); parameter layout identical to the plain conv
    space_to_depth: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        residual: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if self.space_to_depth:
            assert residual is None, "space_to_depth stem takes no residual"
            assert (
                self.kernel_size == 7 and self.stride == 2 and self.padding == 3
                and self.dilation == 1 and self.groups == 1 and not self.use_bias
            ), "space_to_depth supports the 7x7/s2/p3 stem conv only"
            init = self.kernel_init or nn.initializers.lecun_normal()
            # a 12-channel input is the loader's pre-space-to-depth'd form of
            # a 3-channel image (space_to_depth_host); the stored parameter
            # stays the plain (7, 7, 3, F) kernel either way
            pre = x.shape[-1] == 12
            cin = x.shape[-1] // 4 if pre else x.shape[-1]
            kernel = _KernelHolder(
                (7, 7, cin, self.features), init, name="conv"
            )()
            x = space_to_depth_conv(
                x, kernel, get_compute_dtype(), pre_transformed=pre
            )
            norm = get_norm(self.norm, self.features)
            if norm is not None:
                x = norm(x)
            if self.activation is not None:
                x = self.activation(x)
            return x
        # epilogue fusions supported by the serving GEMM: folded FrozenBN
        # (bottleneck conv3 tail) or plain bias (FPN lateral + top-down add)
        fuse_bn = not self.use_bias and self.norm == "FrozenBN"
        fuse_bias = self.use_bias and self.norm == ""
        # default OFF: measured on TPU v5e (scripts/check_fused_serving.py,
        # R-101 bs16 832x1344 bf16) the Pallas fused GEMM is 0.79x vs XLA's
        # own conv+add fusion (162.4 vs 128.4 ms/batch) — XLA already fuses
        # the residual add into the convolution epilogue. Kernel kept for
        # backends/shapes where it wins; opt in with LVC_TPU_FUSED_RESIDUAL=1.
        fuse = (
            residual is not None
            and os.environ.get("LVC_TPU_FUSED_RESIDUAL", "0") == "1"
            and self.kernel_size == 1
            and self.stride == 1
            and self.padding == 0
            and self.dilation == 1
            and self.groups == 1
            and (fuse_bn or fuse_bias)
            and get_compute_dtype() == jnp.bfloat16
            and jax.default_backend() == "tpu"
        )
        if fuse:
            from lvc_tpu.ops.fused_matmul import conv1x1_affine_residual

            init = self.kernel_init or nn.initializers.lecun_normal()
            # same param paths ("conv/kernel", "conv/bias") + inits as the
            # nn.Conv branch, so init/restore are identical whichever
            # branch traces
            if fuse_bn:
                kernel = _KernelHolder(
                    (1, 1, x.shape[-1], self.features), init, name="conv"
                )()
                norm = FrozenBatchNorm(self.features, name="FrozenBatchNorm_0")
                scale, shift = norm.folded()
            else:
                kernel, shift = _KernelHolder(
                    (1, 1, x.shape[-1], self.features),
                    init,
                    bias_features=self.features,
                    bias_init=self.bias_init or nn.initializers.zeros,
                    name="conv",
                )()
                scale = jnp.ones((self.features,), jnp.float32)
            dtype = get_compute_dtype()
            y = conv1x1_affine_residual(
                x.astype(dtype),
                kernel.astype(dtype),
                scale,
                shift,
                residual.astype(dtype),
                relu=self.activation is nn.relu,
                # train (AMP forward) uses the custom-VJP variant: Pallas
                # forward, exact XLA-dot backward (ops/fused_matmul.py)
                trainable=train,
            )
            if self.activation is not None and self.activation is not nn.relu:
                y = self.activation(y)
            return y
        pad = self.padding
        kwargs = {}
        if self.kernel_init is not None:
            kwargs["kernel_init"] = self.kernel_init
        if self.bias_init is not None:
            kwargs["bias_init"] = self.bias_init
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
        if residual is not None:
            x = x + residual
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
