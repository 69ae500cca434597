"""End-to-end model smoke tests: build from config, init, train/infer."""
import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lvc_tpu.config import get_cfg
from lvc_tpu.modeling.meta_arch.build import build_model


def small_cfg():
    cfg = get_cfg()
    cfg.merge_from_file("configs/Base-RCNN-FPN.yaml")
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 6
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 200
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 100
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    return cfg


def make_batch(B=2, H=128, W=128, G=5, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.rand(B, H, W, 3).astype(np.float32) * 255
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_valid = np.zeros((B, G), bool)
    gt_classes = np.zeros((B, G), np.int32)
    for b in range(B):
        n = rng.randint(1, G + 1)
        for i in range(n):
            x0, y0 = rng.rand(2) * 60
            w, h = rng.rand(2) * 40 + 8
            gt_boxes[b, i] = [x0, y0, x0 + w, y0 + h]
            gt_classes[b, i] = rng.randint(0, 6)
            gt_valid[b, i] = True
    return {
        "image": jnp.asarray(imgs),
        "image_size": jnp.asarray(np.full((B, 2), [H, W], np.int32)),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_classes": jnp.asarray(gt_classes),
        "gt_valid": jnp.asarray(gt_valid),
    }


@pytest.fixture(scope="module")
def model_and_params():
    cfg = small_cfg()
    model = build_model(cfg)
    batch = make_batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    return cfg, model, variables, batch


def test_train_forward_losses(model_and_params):
    cfg, model, variables, batch = model_and_params
    losses = model.apply(
        variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)}
    )
    assert set(losses) == {"loss_cls", "loss_box_reg", "loss_rpn_cls", "loss_rpn_loc"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_inference_shapes(model_and_params):
    cfg, model, variables, batch = model_and_params
    dets = model.apply(variables, batch, train=False)
    B = batch["image"].shape[0]
    assert dets.boxes.shape == (B, 20, 4)
    assert dets.scores.shape == (B, 20)
    assert dets.classes.shape == (B, 20)
    assert dets.valid.shape == (B, 20)
    # detections inside the image
    b = np.asarray(dets.boxes)
    assert (b >= -1e-3).all() and (b <= 128 + 1e-3).all()


def test_grads_flow(model_and_params):
    cfg, model, variables, batch = model_and_params

    def loss_fn(params):
        losses = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            batch,
            train=True,
            rngs={"sampling": jax.random.PRNGKey(3)},
        )
        return sum(losses.values())

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert np.isfinite(total) and total > 0
