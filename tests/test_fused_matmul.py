"""Fused 1x1-conv + affine + residual + ReLU epilogue (ops/fused_matmul.py).

The Pallas GEMM runs in interpret mode here (CPU); on-TPU equivalence with
the unfused path is additionally exercised by the serving bench. The
Conv2d(residual=...) call must be numerically identical to the reference
bottleneck tail ``relu(frozen_bn(conv1x1(x)) + shortcut)``
(detectron2/modeling/backbone/resnet.py:101) and must not change the
parameter tree (checkpoint layout).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lvc_tpu.ops.fused_matmul import conv1x1_affine_residual, matmul_affine_residual


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("M", [512, 700])  # aligned + edge-clipped grids
def test_matmul_affine_residual_interpret(relu, M):
    rng = np.random.RandomState(0)
    K, N = 64, 256
    x = rng.randn(M, K).astype(np.float32)
    w = (rng.randn(K, N) * 0.1).astype(np.float32)
    scale = (rng.rand(N) + 0.5).astype(np.float32)
    shift = rng.randn(N).astype(np.float32)
    res = rng.randn(M, N).astype(np.float32)
    out = matmul_affine_residual(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale), jnp.asarray(shift),
        jnp.asarray(res), relu=relu, interpret=True,
    )
    ref = x @ w * scale + shift + res
    if relu:
        ref = np.maximum(ref, 0.0)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-6, rtol=1e-6)


def test_conv1x1_wrapper_bf16():
    rng = np.random.RandomState(1)
    B, H, W, K, N = 2, 10, 14, 128, 256
    x = rng.randn(B, H, W, K).astype(np.float32)
    k = (rng.randn(1, 1, K, N) * 0.05).astype(np.float32)
    scale = (rng.rand(N) + 0.5).astype(np.float32)
    shift = rng.randn(N).astype(np.float32)
    res = rng.randn(B, H, W, N).astype(np.float32)
    out = conv1x1_affine_residual(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(scale), jnp.asarray(shift), jnp.asarray(res, jnp.bfloat16),
        interpret=True,
    )
    assert out.dtype == jnp.bfloat16 and out.shape == (B, H, W, N)
    xb = np.asarray(x.astype(jnp.bfloat16), np.float32)
    kb = np.asarray(k.astype(jnp.bfloat16), np.float32)
    rb = np.asarray(res.astype(jnp.bfloat16), np.float32)
    ref = np.maximum(xb @ kb[0, 0] * scale + shift + rb, 0.0)
    err = np.abs(np.asarray(out, np.float32) - ref) / (np.abs(ref) + 1.0)
    assert err.max() < 0.02, err.max()


def test_conv2d_residual_matches_manual_tail():
    """Conv2d(..., norm=FrozenBN, activation=relu)(x, residual=s) ==
    relu(frozen_bn(conv(x)) + s) on the (CPU) unfused path."""
    from lvc_tpu.modeling.layers import Conv2d, FrozenBatchNorm

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 8, 32), jnp.float32)
    s = jnp.asarray(rng.randn(2, 8, 8, 64), jnp.float32)

    conv = Conv2d(64, kernel_size=1, use_bias=False, norm="FrozenBN",
                  activation=jax.nn.relu)
    variables = conv.init(jax.random.PRNGKey(0), x, residual=s)
    # randomize the BN stats so the fold is non-trivial
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.1 * rng.randn(*v.shape).astype(np.float32), variables
    )
    fused_call = conv.apply(variables, x, residual=s)

    kernel = variables["params"]["conv"]["kernel"]
    bn_p = variables["params"]["FrozenBatchNorm_0"]
    bn_s = variables["batch_stats"]["FrozenBatchNorm_0"]
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    scale = bn_p["weight"] / np.sqrt(bn_s["running_var"] + 1e-5)
    shift = bn_p["bias"] - bn_s["running_mean"] * scale
    ref = jax.nn.relu(y * scale + shift + s)
    np.testing.assert_allclose(np.asarray(fused_call), np.asarray(ref), atol=1e-5)


def test_bottleneck_param_tree_unchanged():
    """The residual-call refactor must not move any parameter: the reference
    checkpoint layout (conv3/conv/kernel + conv3/FrozenBatchNorm_0/...) is
    what checkpoint/convert.py renames onto."""
    from lvc_tpu.modeling.backbone.resnet import BottleneckBlock

    block = BottleneckBlock(
        out_channels=64, bottleneck_channels=16, has_shortcut=True
    )
    x = jnp.zeros((1, 8, 8, 32), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    assert set(params) == {"conv1", "conv2", "conv3", "shortcut"}
    for name in ("conv1", "conv2", "conv3", "shortcut"):
        assert set(params[name]) == {"conv", "FrozenBatchNorm_0"}, params[name].keys()
        assert set(params[name]["FrozenBatchNorm_0"]) == {"weight", "bias"}
    assert set(variables["batch_stats"]["conv3"]["FrozenBatchNorm_0"]) == {
        "running_mean", "running_var",
    }


@pytest.mark.parametrize("relu", [True, False])
def test_trainable_vjp_matches_composition_grads(relu):
    """custom-VJP fused GEMM: grads for every input must equal jax.grad of
    the unfused composition (f32, interpret-mode forward)."""
    from lvc_tpu.ops.fused_matmul import matmul_affine_residual_trainable

    rng = np.random.RandomState(3)
    M, K, N = 96, 32, 128
    x = jnp.asarray(rng.randn(M, K), jnp.float32)
    w = jnp.asarray(rng.randn(K, N) * 0.2, jnp.float32)
    scale = jnp.asarray(rng.rand(N) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(N) * 0.3, jnp.float32)
    res = jnp.asarray(rng.randn(M, N), jnp.float32)
    cot = jnp.asarray(rng.randn(M, N), jnp.float32)

    def composed(x, w, scale, shift, res):
        z = x @ w * scale + shift + res
        if relu:
            z = jax.nn.relu(z)
        return jnp.sum(z * cot)

    def fused(x, w, scale, shift, res):
        y = matmul_affine_residual_trainable(x, w, scale, shift, res, relu, True)
        return jnp.sum(y * cot)

    ref = jax.grad(composed, argnums=(0, 1, 2, 3, 4))(x, w, scale, shift, res)
    got = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(x, w, scale, shift, res)
    for name, r, g in zip(("dx", "dw", "dscale", "dshift", "dres"), ref, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-4, rtol=2e-5, err_msg=name
        )


def test_trainable_vjp_through_bottleneck_train_mode():
    """BottleneckBlock in train mode routes through the trainable fused GEMM
    when the serving gates are spoofed; its param grads must match the plain
    XLA path."""
    import lvc_tpu.modeling.layers as L
    import lvc_tpu.ops.fused_matmul as fm
    from lvc_tpu.modeling.backbone.resnet import BottleneckBlock

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 32), jnp.float32)
    cot_shape = (1, 8, 8, 64)
    cot = jnp.asarray(rng.randn(*cot_shape), jnp.float32)
    block = BottleneckBlock(out_channels=64, bottleneck_channels=16, has_shortcut=True)
    v = block.init(jax.random.PRNGKey(0), x)
    params, rest = v["params"], {k: v[k] for k in v if k != "params"}

    def loss(params, spoof):
        if spoof:
            orig = jax.default_backend
            jax.default_backend = lambda: "tpu"
        try:
            with L.compute_dtype_scope(jnp.bfloat16):
                y = block.apply({"params": params, **rest}, x, train=True)
        finally:
            if spoof:
                jax.default_backend = orig
        return jnp.sum(y.astype(jnp.float32) * cot)

    orig_impl = fm.conv1x1_affine_residual
    fm.conv1x1_affine_residual = lambda *a, **k: orig_impl(*a, **{**k, "interpret": True})
    try:
        g_fused = jax.grad(loss)(params, True)
        g_plain = jax.grad(loss)(params, False)
    finally:
        fm.conv1x1_affine_residual = orig_impl

    flat_f = jax.tree_util.tree_leaves_with_path(g_fused)
    flat_p = dict(
        (jax.tree_util.keystr(p), l) for p, l in jax.tree_util.tree_leaves_with_path(g_plain)
    )
    for path, leaf in flat_f:
        ref = flat_p[jax.tree_util.keystr(path)]
        a, b = np.asarray(leaf, np.float32), np.asarray(ref, np.float32)
        denom = np.abs(b).max() + 1e-3
        assert np.abs(a - b).max() / denom < 0.06, (
            jax.tree_util.keystr(path), np.abs(a - b).max(), denom
        )
