import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp

from lvc_tpu.config import get_cfg
from lvc_tpu.modeling.backbone.swin import (
    SwinTransformer,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 14, 21, 8).astype(np.float32))
    w = window_partition(x, 7)
    assert w.shape == (2 * 2 * 3, 49, 8)
    back = window_reverse(w, 7, 14, 21)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_swin_feature_shapes():
    model = SwinTransformer(embed_dim=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8))
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(variables, x)
    assert out["res2"].shape == (1, 16, 24, 32)
    assert out["res3"].shape == (1, 8, 12, 64)
    assert out["res4"].shape == (1, 4, 6, 128)
    assert out["res5"].shape == (1, 2, 3, 256)


def test_swin_fpn_detector_builds():
    from lvc_tpu.modeling.meta_arch.build import build_model
    import __graft_entry__ as g

    cfg = get_cfg()
    cfg.merge_from_file("configs/Base-RCNN-FPN.yaml")
    cfg.MODEL.BACKBONE.NAME = "build_swin_transformer_fpn_backbone"
    cfg.MODEL.SWIN.SWIN_SIZE = "tiny"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    model = build_model(cfg)
    batch = g._make_batch(B=1, H=128, W=128)
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    dets = model.apply(variables, batch, train=False)
    assert dets.boxes.shape == (1, 10, 4)
