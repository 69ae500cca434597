"""Fused 1x1-conv (GEMM) with affine + residual-add + ReLU epilogue.

TPU-native counterpart of the reference bottleneck tail
(detectron2/modeling/backbone/resnet.py:101 BottleneckBlock.forward:
``out = conv3(out); out += shortcut; out = relu(out)`` with conv3 a 1x1
conv wrapped in FrozenBatchNorm2d). Under XLA the residual add compiles
to a standalone elementwise fusion that reads the conv output AND the
shortcut from HBM and writes the sum back — three full HBM touches of a
(B, H, W, 4C) tensor per bottleneck block, measured at ~12.6 ms/step for
R-101 bs8 (docs/PERF.md "Known remaining headroom"). A 1x1 conv is just a
GEMM over channels, so this kernel runs it on the MXU with the folded-BN
affine, the residual add, and the ReLU applied in the epilogue while the
accumulator tile is still in VMEM: the conv output is never materialized
in HBM, saving one read + one write of the activation tensor per block.

Layout: x (M, K) bf16/f32, w (K, N), scale/shift (N,) f32 (folded
FrozenBN), residual (M, N). Grid is (N-tiles, M-tiles) with the M axis
innermost so the weight block (index depends only on the N tile) stays
resident in VMEM across the whole M sweep while x/residual/out tiles
stream through double-buffered block DMA.

Serving-path only (no VJP): callers fall back to the plain conv+add for
training / non-TPU backends (lvc_tpu/modeling/layers.py Conv2d).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lvc_tpu.ops.pallas_util import out_vma
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, shift_ref, res_ref, out_ref, *, relu):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    y = acc * scale_ref[:] + shift_ref[:] + res_ref[:].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def matmul_affine_residual(
    x: jnp.ndarray,
    w: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    residual: jnp.ndarray,
    relu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """``relu((x @ w) * scale + shift + residual)`` with the epilogue fused
    into the GEMM. x: (M, K); w: (K, N); scale/shift: (N,);
    residual: (M, N). Returns (M, N) in the residual's dtype. M need not be
    tile-aligned (edge blocks are clipped by pallas); K and N should be
    multiples of 128 (true for every ResNet/FPN channel count)."""
    M, K = x.shape
    K2, N = w.shape
    assert K == K2 and residual.shape == (M, N), (x.shape, w.shape, residual.shape)
    assert scale.shape == (N,) and shift.shape == (N,)

    # M tile: big enough to amortize the MXU pipeline, small enough that
    # double-buffered x/res/out tiles fit VMEM next to the resident w block
    # (worst case K=512, N=2048: w 2 MB + 2*(0.5+2+2) MB = 11 MB < 16 MB).
    tile_m = 512 if M >= 512 else max(8, (M + 7) // 8 * 8)
    tile_n = min(N, 2048 if K * N * residual.dtype.itemsize <= 2**21 else 1024)
    grid = (pl.cdiv(N, tile_n), pl.cdiv(M, tile_m))

    # 2-D (1, N) layout for the per-channel vectors: TPU vector memory is
    # (sublane, lane)-tiled, so 1-D blocks would relayout
    scale = scale.astype(jnp.float32).reshape(1, N)
    shift = shift.astype(jnp.float32).reshape(1, N)
    return pl.pallas_call(
        functools.partial(_kernel, relu=relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, K), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda j, i: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_m, tile_n), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, tile_n), lambda j, i: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (M, N), residual.dtype, vma=out_vma(x, w, residual)
        ),
        interpret=interpret,
    )(x, w, scale, shift, residual)


# --------------------------------------------------------------- trainable
# custom-VJP variant: the Pallas GEMM runs the forward; the backward is
# plain XLA dots (the epilogue's VJP recovers the pre-affine product from
# the saved output, so no extra forward GEMM and no saved intermediate):
#   z = (x @ w) * scale + shift + res;  y = relu(z)
#   dz = g * 1{z > 0};  dx = (dz*scale) @ w^T;  dw = x^T @ (dz*scale)
#   dscale = sum(dz * (y - shift - res) / scale);  dshift = sum(dz);  dres = dz
# (where z <= 0, dz = 0, so the clipped region contributes nothing)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def matmul_affine_residual_trainable(x, w, scale, shift, residual, relu=True, interpret=False):
    return matmul_affine_residual(x, w, scale, shift, residual, relu=relu, interpret=interpret)


def _trainable_fwd(x, w, scale, shift, residual, relu, interpret):
    y = matmul_affine_residual(x, w, scale, shift, residual, relu=relu, interpret=interpret)
    return y, (x, w, scale, shift, residual, y)


def _trainable_bwd(relu, interpret, saved, g):
    x, w, scale, shift, residual, y = saved
    g = g.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    if relu:
        g = jnp.where(yf > 0, g, 0.0)
    gs = (g * scale).astype(x.dtype)
    dx = jax.lax.dot_general(
        gs, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    dw = jax.lax.dot_general(
        x, gs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(w.dtype)
    # recover the pre-affine product; where the folded scale is exactly 0
    # (zero-gamma BN init / pruned channels) it is unrecoverable — emit 0
    # there instead of inf/nan (those channels' outputs don't vary with x
    # through the matmul, and FrozenBN affines are frozen in the solver;
    # a nan here would poison global-norm gradient clipping)
    safe_scale = jnp.where(scale == 0, 1.0, scale)
    dot = (yf - shift - residual.astype(jnp.float32)) / safe_scale
    dscale = jnp.sum(
        jnp.where(scale == 0, 0.0, g * dot), axis=0
    ).astype(scale.dtype)
    dshift = jnp.sum(g, axis=0).astype(shift.dtype)
    dres = g.astype(residual.dtype)
    return dx, dw, dscale, dshift, dres


matmul_affine_residual_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def conv1x1_affine_residual(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    shift: jnp.ndarray,
    residual: jnp.ndarray,
    relu: bool = True,
    interpret: bool = False,
    trainable: bool = False,
) -> jnp.ndarray:
    """NHWC wrapper: x (B, H, W, K), kernel (1, 1, K, N) or (K, N),
    residual (B, H, W, N) -> (B, H, W, N). ``trainable`` routes through the
    custom-VJP variant (Pallas forward, XLA-dot backward)."""
    if kernel.ndim == 4:
        assert kernel.shape[:2] == (1, 1), kernel.shape
        kernel = kernel[0, 0]
    B, H, W, K = x.shape
    N = kernel.shape[1]
    x2d = x.reshape(B * H * W, K)
    res2d = residual.reshape(B * H * W, N)
    if trainable:
        # custom_vjp nondiff args must be positional
        out = matmul_affine_residual_trainable(
            x2d, kernel, scale, shift, res2d, relu, interpret
        )
    else:
        out = matmul_affine_residual(
            x2d, kernel, scale, shift, res2d, relu=relu, interpret=interpret
        )
    return out.reshape(B, H, W, N)
