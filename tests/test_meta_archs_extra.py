"""Smoke tests for the vendored-surface meta-archs: RetinaNet,
SemanticSegmentor, PanopticFPN (SURVEY.md §2.2 d2 meta-arch row)."""
import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lvc_tpu.config import get_cfg
from lvc_tpu.modeling.meta_arch.build import build_model


B, H, W, G = 1, 64, 64, 4


def _cfg(meta_arch):
    cfg = get_cfg()
    cfg.merge_from_file("configs/Base-RCNN-FPN.yaml")
    cfg.MODEL.META_ARCHITECTURE = meta_arch
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 7
    return cfg


def _batch(train=False, seed=0):
    rng = np.random.RandomState(seed)
    batch = {
        "image": jnp.asarray(rng.rand(B, H, W, 3) * 255, jnp.float32),
        "image_size": jnp.asarray([[H, W]], np.int32),
    }
    if train:
        boxes = np.zeros((B, G, 4), np.float32)
        boxes[0, :2] = [[8, 8, 30, 34], [20, 24, 50, 58]]
        batch.update(
            gt_boxes=jnp.asarray(boxes),
            gt_classes=jnp.zeros((B, G), jnp.int32),
            gt_valid=jnp.asarray(np.array([[True, True, False, False]])),
        )
        tgt = rng.randint(0, 7, (B, H, W)).astype(np.int32)
        tgt[:, 48:] = 255
        batch["sem_seg"] = jnp.asarray(tgt)
    return batch


def test_retinanet_smoke():
    model = build_model(_cfg("RetinaNet"))
    batch = _batch()
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    dets = model.apply(variables, batch, train=False)
    assert dets.boxes.shape[-1] == 4 and dets.valid.dtype == bool
    tbatch = _batch(train=True)
    losses = model.apply(variables, tbatch, train=True)
    assert set(losses) == {"loss_cls", "loss_box_reg"}
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_retinanet_head_bias_prior():
    # with prior-prob bias init, initial fg probability ~ 0.01 everywhere
    model = build_model(_cfg("RetinaNet"))
    batch = _batch()
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    biases = [v for k, v in flat if "cls_score" in str(k) and "bias" in str(k)]
    assert biases and np.allclose(
        jax.nn.sigmoid(np.asarray(biases[0])), 0.01, atol=1e-4
    )


def test_semantic_segmentor_smoke():
    model = build_model(_cfg("SemanticSegmentor"))
    batch = _batch()
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    logits = model.apply(variables, batch, train=False)
    assert logits.shape == (B, H, W, 7)
    tbatch = _batch(train=True)
    losses = model.apply(variables, tbatch, train=True)
    assert np.isfinite(float(losses["loss_sem_seg"]))


def test_sem_seg_loss_ignores_padding():
    from lvc_tpu.modeling.meta_arch.semantic_seg import SemSegFPNHead

    head = SemSegFPNHead(in_features=("p2",), strides={"p2": 4}, num_classes=3)
    logits = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 3), jnp.float32)
    tgt = np.full((1, 8, 8), 255, np.int32)
    tgt[0, 0, 0] = 1
    l_one = head.losses(logits, jnp.asarray(tgt))["loss_sem_seg"]
    # manual CE at the single valid pixel
    want = -jax.nn.log_softmax(logits[0, 0, 0])[1]
    assert float(l_one) == pytest.approx(float(want), rel=1e-5)


def test_panoptic_fpn_smoke():
    model = build_model(_cfg("PanopticFPN"))
    batch = _batch()
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=False,
    )
    out = model.apply(variables, batch, train=False)
    assert out["sem_seg"].shape == (B, H, W, 7)
    assert out["instances"].boxes.shape[-1] == 4
    tbatch = _batch(train=True)
    losses = model.apply(
        variables, tbatch, train=True, rngs={"sampling": jax.random.PRNGKey(2)}
    )
    assert "loss_sem_seg" in losses and "loss_cls" in losses
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_panoptic_combine():
    from lvc_tpu.modeling.meta_arch.panoptic_fpn import (
        combine_semantic_and_instance_outputs,
    )

    Hc = Wc = 64
    D = 3
    masks = np.zeros((D, Hc, Wc), bool)
    masks[0, 5:25, 5:25] = True
    masks[1, 6:24, 6:24] = True  # mostly covered by instance 0 -> dropped
    masks[2, 40:50, 40:50] = True
    sem = np.zeros((Hc, Wc, 5), np.float32)
    sem[..., 2] = 1.0  # one big stuff region
    pan, segs = combine_semantic_and_instance_outputs(
        np.zeros((D, 4)),
        np.array([0.9, 0.8, 0.7]),
        np.array([1, 1, 2]),
        np.array([True, True, True]),
        masks,
        sem,
        stuff_area_limit=100,
    )
    thing_segs = [s for s in segs if s["isthing"]]
    stuff_segs = [s for s in segs if not s["isthing"]]
    assert len(thing_segs) == 2  # overlap-suppressed middle instance
    assert len(stuff_segs) == 1 and stuff_segs[0]["category_id"] == 2
    assert pan.max() == len(segs)


def test_panoptic_fpn_e2e_with_real_masks():
    """PanopticFPN with MASK_ON: instance branch produces real pasted
    masks that flow through the combine into PQ (VERDICT r1 next #3)."""
    from lvc_tpu.evaluation.panoptic_evaluation import COCOPanopticEvaluator
    from lvc_tpu.modeling.meta_arch.panoptic_fpn import (
        combine_semantic_and_instance_outputs,
    )
    from lvc_tpu.modeling.roi_heads.mask_head import paste_masks_in_image

    cfg = _cfg("PanopticFPN")
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.0
    model = build_model(cfg)

    tbatch = _batch(train=True)
    G = tbatch["gt_boxes"].shape[1]
    masks = np.zeros((B, G, H // 4, W // 4), np.float32)
    masks[0, 0, 2:9, 2:8] = 1.0
    masks[0, 1, 6:15, 5:13] = 1.0
    tbatch["gt_masks"] = jnp.asarray(masks)
    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, tbatch, train=True)
    losses = model.apply(
        variables, tbatch, train=True,
        rngs={"sampling": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
    )
    assert "loss_mask" in losses and np.isfinite(float(losses["loss_mask"]))

    out = model.apply(variables, _batch(train=False), train=False)
    dets = out["instances"]
    assert dets.masks is not None and dets.masks.shape[2:] == (28, 28)

    pasted = np.asarray(
        paste_masks_in_image(dets.masks[0], dets.boxes[0], (H, W))
    )
    pan, segs = combine_semantic_and_instance_outputs(
        np.asarray(dets.boxes[0]),
        np.asarray(dets.scores[0]),
        np.asarray(dets.classes[0]),
        np.asarray(dets.valid[0]),
        pasted,
        np.asarray(out["sem_seg"][0]),
        instances_confidence_threshold=0.0,
        stuff_area_limit=10,
    )
    # feed the panoptic output through the PQ evaluator (self-comparison
    # must give PQ 100 on every populated category)
    ev = COCOPanopticEvaluator()
    ev.process(pan, segs, pan, segs)
    res = ev.evaluate()["panoptic_seg"]
    if segs:
        assert res["PQ"] == pytest.approx(100.0)
