"""RBG + cascade UBBR box-corrector tests."""
import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lvc_tpu.config import get_cfg

import __graft_entry__ as g

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ubbr_cfg(num_classes=6):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs/Base-RCNN-FPN.yaml"))
    cfg.MODEL.ROI_HEADS.NAME = "CascadeROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = num_classes
    cfg.MODEL.ROI_HEADS.OUTPUT_LAYER = "BoxOnlyLayersCascade"
    cfg.MODEL.ROI_HEADS.PROPOSAL_APPEND_GT = False
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 1.0
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_HEADS.IOU_THRESHOLDS = [0.3]
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 3
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    cfg.MODEL.ROI_BOX_CASCADE_HEAD.IOUS = [0.3, 0.5, 0.7]
    cfg.MODEL.PROPOSAL_GENERATOR.NAME = "RBG"
    cfg.MODEL.LOAD_PROPOSALS = True
    return cfg


def make_batch_with_proposals(B=2, H=128, W=128, G=6, P=8, seed=0, num_classes=6):
    batch = g._make_batch(B=B, H=H, W=W, G=G, train=True, seed=seed)
    rng = np.random.RandomState(seed + 1)
    batch["gt_classes"] = jnp.asarray(
        np.asarray(batch["gt_classes"]) % num_classes
    )
    gtb = np.asarray(batch["gt_boxes"])
    props = np.zeros((B, P, 4), np.float32)
    valid = np.zeros((B, P), bool)
    for b in range(B):
        for p in range(P):
            src = gtb[b, p % 3]
            jit = rng.randn(4) * 3
            props[b, p] = src + jit
            valid[b, p] = True
    props[..., 2] = np.maximum(props[..., 2], props[..., 0] + 1)
    props[..., 3] = np.maximum(props[..., 3], props[..., 1] + 1)
    batch["proposal_boxes"] = jnp.asarray(props.clip(0, W))
    batch["proposal_logits"] = jnp.zeros((B, P))
    batch["proposal_valid"] = jnp.asarray(valid)
    return batch


def test_rbg_generates_overlapping_boxes():
    from lvc_tpu.modeling.proposal_generator.rbg import RBG
    from lvc_tpu.structures import boxes as box_ops

    rbg = RBG(batch_size_per_image=16, positive_fraction=1.0)
    batch = make_batch_with_proposals()
    out, _ = rbg.init_with_output(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        None,
        batch["image_size"],
        batch["gt_boxes"],
        batch["gt_valid"],
        train=True,
        proposal_boxes=batch["proposal_boxes"],
        proposal_logits=batch["proposal_logits"],
        proposal_valid=batch["proposal_valid"],
    )
    boxes, logits, valid, losses = out
    B, P = batch["proposal_valid"].shape
    assert boxes.shape == (B, P + 32, 4)  # P real + 2*positive_num generated
    # every valid generated box overlaps some gt with IoU > t
    for b in range(B):
        iou = np.asarray(
            box_ops.pairwise_iou(batch["gt_boxes"][b], boxes[b])
        )
        iou = np.where(np.asarray(batch["gt_valid"][b])[:, None], iou, 0)
        v = np.asarray(valid[b])
        assert v.sum() > 0
        assert (iou.max(axis=0)[v] > 0.3).all()


@pytest.fixture(scope="module")
def ubbr_model():
    from lvc_tpu.modeling.meta_arch.build import build_model

    cfg = ubbr_cfg()
    model = build_model(cfg)
    batch = make_batch_with_proposals()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    return cfg, model, variables, batch


def test_cascade_ubbr_train_losses(ubbr_model):
    cfg, model, variables, batch = ubbr_model
    losses = model.apply(
        variables, batch, train=True, rngs={"sampling": jax.random.PRNGKey(2)}
    )
    assert set(losses) == {
        "loss_box_reg_stage0",
        "loss_box_reg_stage1",
        "loss_box_reg_stage2",
    }, losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def total(params):
        l = model.apply(
            {"params": params, **{k: v for k, v in variables.items() if k != "params"}},
            batch,
            train=True,
            rngs={"sampling": jax.random.PRNGKey(3)},
        )
        return sum(l.values())

    grads = jax.grad(total)(variables["params"])
    gsum = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 0


def test_reg_only_inference_alignment():
    from lvc_tpu.modeling.meta_arch.build import build_model
    from lvc_tpu.modeling.roi_heads.cascade_rcnn import RegOnlyOutput

    cfg = ubbr_cfg()
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNNRegOnly"
    model = build_model(cfg)
    batch = make_batch_with_proposals()
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert isinstance(out, RegOnlyOutput)
    B, G = np.asarray(batch["gt_valid"]).shape
    assert out.boxes.shape == (B, G, 4)
    assert out.classes.shape == (B, G)
    # valid slots track the candidate slots
    np.testing.assert_array_equal(
        np.asarray(out.valid), np.asarray(batch["gt_valid"]) & (np.asarray(batch["gt_classes"]) < 6)
    )
    b = np.asarray(out.boxes)
    assert np.isfinite(b).all()
    assert (b[..., 2] >= b[..., 0] - 1e-3).all()
