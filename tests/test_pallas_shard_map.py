"""Pallas kernels must trace inside shard_map(check_vma=True).

The DP train step runs the whole model inside ``jax.shard_map`` with
replication tracking ON (engine/train_loop.py). pallas_call outputs are
opaque to JAX's vma inference, so every out_shape must declare the mesh
axes it varies over (ops/pallas_util.out_vma) — otherwise the step fails
at trace time on real TPU meshes ("vma on jax.ShapeDtypeStruct must not
be None"). CPU tests default to the exact-gather pooler and never hit the
Pallas path; these tests trace the kernels abstractly (jax.eval_shape,
interpret=False — identical trace path to TPU) so the regression is
caught on CPU. Numerical correctness is covered by the interpret-mode
tests in test_roi_align.py / test_fused_matmul.py.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lvc_tpu.ops import roi_align as ra


def _mesh(n=2):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("data",))


def _feats_boxes(rng, B, R, C=128):
    feats = []
    h, w = 32, 48
    strides = (4, 8, 16, 32, 64)
    for _ in strides:
        feats.append(jnp.asarray(rng.rand(B, h, w, C).astype(np.float32)))
        h, w = (h + 1) // 2, (w + 1) // 2
    s = rng.uniform(8, 100, (B, R))
    x0 = rng.uniform(0, 60, (B, R))
    y0 = rng.uniform(0, 40, (B, R))
    boxes = jnp.asarray(np.stack([x0, y0, x0 + s, y0 + s], -1), np.float32)
    return feats, boxes, strides


def test_paired_pallas_traces_inside_shard_map_check_vma():
    mesh = _mesh()
    rng = np.random.RandomState(0)
    feats, boxes, strides = _feats_boxes(rng, B=2, R=8)

    def fn(feats, boxes):
        return ra.batched_multilevel_roi_align_pallas_paired(
            list(feats), boxes, strides
        )

    smapped = jax.shard_map(
        fn, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=True,
    )
    out = jax.eval_shape(smapped, feats, boxes)
    assert out.shape == (2, 8, 7, 7, 128)


def test_band_pallas_traces_inside_shard_map_check_vma():
    mesh = _mesh()
    rng = np.random.RandomState(3)
    feats, boxes, strides = _feats_boxes(rng, B=2, R=8)

    def fn(feats, boxes):
        return ra.batched_multilevel_roi_align_pallas_fast(
            list(feats), boxes, strides
        )

    smapped = jax.shard_map(
        fn, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=True,
    )
    out = jax.eval_shape(smapped, feats, boxes)
    assert out.shape == (2, 8, 7, 7, 128)


def test_trainable_vjp_traces_inside_shard_map_check_vma():
    """Forward AND backward kernels trace under replication tracking —
    this is the exact shape of the DP train step's pooler use."""
    mesh = _mesh()
    rng = np.random.RandomState(1)
    feats, boxes, strides = _feats_boxes(rng, B=2, R=8)

    def loss(feats, boxes):
        pooled = ra.batched_multilevel_roi_align_pallas_trainable(
            tuple(feats), boxes, strides
        )
        return jnp.sum(pooled ** 2)

    def step(feats, boxes):
        l, grads = jax.value_and_grad(loss)(feats, boxes)
        return jax.lax.psum(l, "data"), grads

    smapped = jax.shard_map(
        step, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=(P(), P("data")), check_vma=True,
    )
    l, grads = jax.eval_shape(smapped, feats, boxes)
    assert l.shape == ()
    assert grads[0].shape == feats[0].shape


def test_fused_residual_gemm_traces_inside_shard_map_check_vma():
    from lvc_tpu.ops.fused_matmul import matmul_affine_residual

    mesh = _mesh()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 256, 128).astype(np.float32))
    w = jnp.asarray(rng.rand(128, 128).astype(np.float32))
    scale = jnp.asarray(rng.rand(128).astype(np.float32))
    shift = jnp.asarray(rng.rand(128).astype(np.float32))
    res = jnp.asarray(rng.rand(2, 256, 128).astype(np.float32))

    def fn(x, res):
        return matmul_affine_residual(x[0], w, scale, shift, res[0], relu=True)[None]

    smapped = jax.shard_map(
        fn, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=True,
    )
    out = jax.eval_shape(smapped, x, res)
    assert out.shape == (2, 256, 128)
