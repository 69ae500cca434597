"""Res5 / Parallel / CascadeBBox heads + context meta-arch smoke tests."""
import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lvc_tpu.config import get_cfg
from lvc_tpu.modeling.meta_arch.build import build_model

import __graft_entry__ as g

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def small_batch(num_classes):
    batch = g._make_batch(B=1, H=128, W=128, G=6, train=True, seed=0)
    batch["gt_classes"] = jnp.asarray(np.asarray(batch["gt_classes"]) % num_classes)
    return batch


def _run_train_and_infer(cfg, batch):
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    losses = model.apply(
        variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)}
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    out = model.apply(variables, batch, train=False)
    return losses, out


def test_res5_roi_heads():
    cfg = get_cfg()
    cfg.MODEL.ROI_HEADS.NAME = "Res5ROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res4"]
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RPN.IN_FEATURES = ["res4"]
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    losses, dets = _run_train_and_infer(cfg, small_batch(4))
    assert "loss_cls" in losses
    assert dets.boxes.shape == (1, 10, 4)


def test_parallel_roi_heads():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs/Base-RCNN-FPN.yaml"))
    cfg.MODEL.ROI_HEADS.NAME = "ParallelStandardROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 80
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    losses, dets = _run_train_and_infer(cfg, small_batch(80))
    assert any(k.startswith("base_") for k in losses)
    assert any(k.startswith("novel_") for k in losses)
    # merged detections: 2x topk slots, classes in the joint 80-way space
    assert dets.boxes.shape == (1, 20, 4)
    assert int(np.asarray(dets.classes).max()) < 80


def test_cascade_bbox_branch_head():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs/Base-RCNN-FPN.yaml"))
    cfg.MODEL.ROI_HEADS.NAME = "StandardROIHeadsCascadeBBox"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    losses, dets = _run_train_and_infer(cfg, small_batch(4))
    assert "loss_box_reg_branch" in losses


def test_context_meta_arch():
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs/Base-RCNN-FPN.yaml"))
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN_Context"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 6
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    losses, out = _run_train_and_infer(cfg, small_batch(6))
    assert "loss_context" in losses
    assert "image_scores" in out and out["image_scores"].shape == (1, 6)
    assert "detections" in out


def test_gdl():
    from lvc_tpu.modeling.meta_arch.gdl import AffineLayer, decouple_layer

    x = jnp.ones((2, 3))
    g_fn = jax.grad(lambda x: decouple_layer(x, 0.1).sum())
    np.testing.assert_allclose(np.asarray(g_fn(x)), 0.1, rtol=1e-6)
    layer = AffineLayer(3)
    v = layer.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(layer.apply(v, x)), 1.0)
