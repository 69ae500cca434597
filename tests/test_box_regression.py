"""Parity test of Box2BoxTransform against the reference implementation.

The reference module (detectron2/modeling/box_regression.py) only imports
torch, so we load it standalone and compare outputs at fp32.
"""
import importlib.util
import os

import numpy as np
import jax.numpy as jnp
import pytest

from lvc_tpu.modeling.box_regression import Box2BoxTransform

REF = "/root/reference/detectron2/modeling/box_regression.py"


def _load_ref():
    import sys

    spec = importlib.util.spec_from_file_location("ref_box_regression", REF)
    mod = importlib.util.module_from_spec(spec)
    # torch.jit.script needs the module discoverable for source inspection
    sys.modules["ref_box_regression"] = mod
    spec.loader.exec_module(mod)
    return mod


def _rand_boxes(rng, n):
    b = rng.rand(n, 4).astype(np.float32) * 100
    b[:, 2:] = b[:, :2] + b[:, 2:] + 1.0
    return b


def test_roundtrip():
    rng = np.random.RandomState(1)
    src = _rand_boxes(rng, 32)
    tgt = _rand_boxes(rng, 32)
    t = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))
    deltas = t.get_deltas(jnp.asarray(src), jnp.asarray(tgt))
    rec = t.apply_deltas(deltas, jnp.asarray(src))
    np.testing.assert_allclose(np.asarray(rec), tgt, rtol=1e-4, atol=1e-3)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_parity_with_reference():
    import torch

    ref = _load_ref()
    rng = np.random.RandomState(2)
    src = _rand_boxes(rng, 64)
    tgt = _rand_boxes(rng, 64)
    deltas_in = rng.randn(64, 8).astype(np.float32)  # K=2 classes
    weights = (10.0, 10.0, 5.0, 5.0)

    ref_t = ref.Box2BoxTransform(weights=weights)
    ours = Box2BoxTransform(weights)

    ref_deltas = ref_t.get_deltas(torch.from_numpy(src), torch.from_numpy(tgt)).numpy()
    our_deltas = np.asarray(ours.get_deltas(jnp.asarray(src), jnp.asarray(tgt)))
    np.testing.assert_allclose(our_deltas, ref_deltas, rtol=1e-5, atol=1e-5)

    ref_boxes = ref_t.apply_deltas(torch.from_numpy(deltas_in), torch.from_numpy(src)).numpy()
    our_boxes = np.asarray(ours.apply_deltas(jnp.asarray(deltas_in), jnp.asarray(src)))
    np.testing.assert_allclose(our_boxes, ref_boxes, rtol=1e-5, atol=1e-4)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_scale_clamp_parity():
    import torch

    ref = _load_ref()
    src = np.array([[0.0, 0.0, 16.0, 16.0]], np.float32)
    deltas = np.array([[0.0, 0.0, 50.0, 50.0]], np.float32)  # huge dw/dh -> clamped
    ref_t = ref.Box2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0))
    ours = Box2BoxTransform((1.0, 1.0, 1.0, 1.0))
    ref_boxes = ref_t.apply_deltas(torch.from_numpy(deltas), torch.from_numpy(src)).numpy()
    our_boxes = np.asarray(ours.apply_deltas(jnp.asarray(deltas), jnp.asarray(src)))
    np.testing.assert_allclose(our_boxes, ref_boxes, rtol=1e-5)
