"""Tests for the wider vendored-surface components: config compat, debug
inference, cascade test-time refinement, RPNComp, mask/keypoint heads,
deformable conv, ASPP, P6P7, clustering, PreciseBN, TTA merge, utils."""
import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ config
def test_compat_upgrade_downgrade():
    from lvc_tpu.config import get_cfg
    from lvc_tpu.config.compat import downgrade_config, guess_version, upgrade_config

    cfg = get_cfg()
    assert cfg.VERSION == 2
    old = downgrade_config(cfg, to_version=1)
    assert old.VERSION == 1
    assert old.MODEL.RPN_HEAD.NAME == cfg.MODEL.RPN.HEAD_NAME
    assert "HEAD_NAME" not in old.MODEL.RPN
    assert old.TEST.DETECTIONS_PER_IMG == cfg.TEST.DETECTIONS_PER_IMAGE
    new = upgrade_config(old)
    assert new.VERSION == 2
    assert new.MODEL.RPN.HEAD_NAME == cfg.MODEL.RPN.HEAD_NAME

    # guessing: unversioned partial config with old spelling dates to v1
    from lvc_tpu.config.config import CfgNode

    partial = CfgNode({"MODEL": CfgNode({"RPN_HEAD": CfgNode({"NAME": "X"})})})
    assert guess_version(partial) == 1
    partial2 = CfgNode({"MODEL": CfgNode({"RPN": CfgNode({"HEAD_NAME": "X"})})})
    assert guess_version(partial2) == 2


def test_merge_from_file_upgrades_old_yaml(tmp_path):
    from lvc_tpu.config import get_cfg

    f = tmp_path / "old.yaml"
    f.write_text("VERSION: 1\nMODEL:\n  RPN_HEAD:\n    NAME: 'MyHead'\n")
    cfg = get_cfg()
    cfg.merge_from_file(str(f))
    assert cfg.MODEL.RPN.HEAD_NAME == "MyHead"
    assert cfg.VERSION == 2


# ------------------------------------------------------- debug inference
def test_fast_rcnn_inference_debug_top2():
    from lvc_tpu.modeling.roi_heads.fast_rcnn_debug import (
        fast_rcnn_inference_debug_single_image,
    )

    rng = np.random.RandomState(0)
    R, K = 16, 5
    boxes = np.zeros((R, K * 4), np.float32)
    for r in range(R):
        x0, y0 = rng.rand(2) * 50
        w, h = rng.rand(2) * 30 + 5
        boxes[r] = np.tile([x0, y0, x0 + w, y0 + h], K)
    logits = rng.rand(R, K + 1).astype(np.float32) * 5
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    dets = fast_rcnn_inference_debug_single_image(
        jnp.asarray(boxes),
        jnp.asarray(probs),
        jnp.asarray([100, 100], jnp.int32),
        jnp.ones((R,), bool),
        0.05,
        0.5,
        10,
    )
    d = np.asarray(dets.valid).sum()
    assert d > 0
    t2s = np.asarray(dets.top2_scores)
    t2i = np.asarray(dets.top2_inds)
    fg = probs[:, :-1]
    for i in range(len(t2s)):
        if not np.asarray(dets.valid)[i]:
            continue
        p = int(np.asarray(dets.proposal_idx)[i])
        expect = np.sort(fg[p])[::-1][:2]
        assert np.allclose(np.sort(t2s[i])[::-1], expect, atol=1e-6)
        # top-1 index matches argmax
        assert t2i[i][0] == int(np.argmax(fg[p]))
        # detection score equals its class's prob
        assert np.isclose(
            np.asarray(dets.scores)[i], fg[p, int(np.asarray(dets.classes)[i])], atol=1e-6
        )


# ----------------------------------------------- cascade 2-pass refinement
def test_cascade_standard_roi_heads_runs():
    from lvc_tpu.modeling.roi_heads.extra_heads import CascadeStandardROIHeads

    head = CascadeStandardROIHeads(
        in_features=("p2",),
        strides={"p2": 4},
        num_classes=4,
        num_fc=1,
        fc_dim=32,
        refine_candidates=8,
        detections_per_image=5,
        pre_nms_candidates=64,
    )
    B, P = 1, 6
    feats = {"p2": jnp.ones((B, 16, 16, 8), jnp.float32)}
    rng = np.random.RandomState(0)
    props = jnp.asarray(rng.rand(B, P, 4).astype(np.float32) * 20)
    props = props.at[..., 2:].add(20.0)
    valid = jnp.ones((B, P), bool)
    sizes = jnp.asarray([[64, 64]], jnp.int32)
    variables = head.init(
        {"params": jax.random.PRNGKey(0)}, feats, props, valid, sizes, None, train=False
    )
    dets, _ = head.apply(variables, feats, props, valid, sizes, None, train=False)
    assert dets.boxes.shape == (B, 5, 4)


# ----------------------------------------------------------------- RPNComp
def test_rpn_comp_build_and_forward():
    from lvc_tpu.config import get_cfg
    from lvc_tpu.modeling.meta_arch.build import build_model

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RPNComp"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_backbone"
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res5"]
    cfg.MODEL.RPNCOMP.POOLER = "avg"
    model = build_model(cfg)
    batch = {
        "image": jnp.ones((2, 64, 64, 3), jnp.float32),
        "image_size": jnp.asarray([[64, 64]] * 2, jnp.int32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out.ndim == 2 and out.shape[0] == 2


# ------------------------------------------------------------- mask head
def test_mask_head_shapes_and_loss():
    from lvc_tpu.modeling.roi_heads.mask_head import (
        MaskRCNNConvUpsampleHead,
        crop_gt_masks,
        mask_rcnn_inference,
        mask_rcnn_loss,
    )

    head = MaskRCNNConvUpsampleHead(num_classes=3, num_conv=1, conv_dim=8)
    x = jnp.ones((4, 7, 7, 8), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(variables, x)
    assert logits.shape == (4, 14, 14, 3)

    # crop: full-image square mask -> crop inside it is all ones
    gt = np.zeros((2, 32, 32), np.float32)
    gt[0, 8:24, 8:24] = 1.0
    boxes = jnp.asarray([[10.0, 10.0, 20.0, 20.0], [0.0, 0.0, 6.0, 6.0]])
    idx = jnp.asarray([0, 1], jnp.int32)
    crops = crop_gt_masks(jnp.asarray(gt), (32, 32), boxes, idx, 14)
    assert crops.shape == (2, 14, 14)
    assert float(crops[0].min()) > 0.9  # box strictly inside the square
    assert float(crops[1].max()) < 0.1  # matched empty mask

    loss = mask_rcnn_loss(
        logits[:2], crops, jnp.asarray([0, 2], jnp.int32), jnp.asarray([True, True])
    )
    assert np.isfinite(float(loss))

    probs = mask_rcnn_inference(logits, jnp.asarray([0, 1, 2, 0], jnp.int32))
    assert probs.shape == (4, 14, 14)
    assert 0.0 <= float(probs.min()) and float(probs.max()) <= 1.0


def test_paste_masks_in_image():
    from lvc_tpu.modeling.roi_heads.mask_head import paste_masks_in_image

    masks = jnp.ones((1, 8, 8), jnp.float32)
    boxes = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])
    out = paste_masks_in_image(masks, boxes, (20, 20), threshold=0.5)
    out = np.asarray(out[0])
    assert out[8, 8] and not out[0, 0] and not out[15, 15]
    # pasted area approximates the box area
    assert 40 <= out.sum() <= 100


# ---------------------------------------------------------- keypoint head
def test_keypoint_head_roundtrip():
    from lvc_tpu.modeling.roi_heads.keypoint_head import (
        KRCNNConvDeconvUpsampleHead,
        keypoint_rcnn_inference,
        keypoint_rcnn_loss,
    )

    head = KRCNNConvDeconvUpsampleHead(num_keypoints=4, num_conv=1, conv_dim=8)
    x = jnp.ones((2, 7, 7, 8), jnp.float32)
    variables = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(variables, x)
    assert logits.shape == (2, 28, 28, 4)

    boxes = jnp.asarray([[0.0, 0.0, 28.0, 28.0], [10.0, 10.0, 38.0, 38.0]])
    kps = jnp.asarray(
        [
            [[5.0, 5.0, 1], [20.0, 7.0, 1], [27.0, 27.0, 1], [100.0, 5.0, 1]],
            [[12.0, 12.0, 1], [5.0, 5.0, 1], [30.0, 30.0, 0], [20.0, 20.0, 1]],
        ],
        jnp.float32,
    )
    loss = keypoint_rcnn_loss(logits, kps, boxes, jnp.asarray([True, True]))
    assert np.isfinite(float(loss))

    dec = keypoint_rcnn_inference(logits, boxes)
    assert dec.shape == (2, 4, 3)
    d = np.asarray(dec)
    assert (d[0, :, 0] >= 0).all() and (d[0, :, 0] <= 28).all()


# ------------------------------------------------------------ deform conv
def test_deform_conv_zero_offsets_matches_conv():
    from lvc_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 10, 10, 3).astype(np.float32))
    w = jnp.asarray(rng.rand(3, 3, 3, 4).astype(np.float32))
    offsets = jnp.zeros((1, 10, 10, 18), jnp.float32)
    out = deform_conv2d(x, offsets, w, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_deform_conv_module_and_modulated():
    from lvc_tpu.ops.deform_conv import DeformConv

    for modulated in (False, True):
        layer = DeformConv(features=4, modulated=modulated)
        x = jnp.ones((1, 8, 8, 3), jnp.float32)
        variables = layer.init(jax.random.PRNGKey(0), x)
        out = layer.apply(variables, x)
        assert out.shape == (1, 8, 8, 4)


# ------------------------------------------------------------ ASPP / P6P7
def test_aspp_shapes():
    from lvc_tpu.modeling.layers import ASPP

    m = ASPP(features=8, dilations=(2, 4, 6))
    x = jnp.ones((1, 16, 16, 4), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (1, 16, 16, 8)


def test_fpn_p6p7():
    from lvc_tpu.modeling.backbone.fpn import FPN, fpn_strides
    from lvc_tpu.modeling.backbone.resnet import ResNet

    bottom_up = ResNet(depth=50, out_features=("res3", "res4", "res5"), norm="FrozenBN")
    fpn = FPN(
        bottom_up=bottom_up,
        in_features=("res3", "res4", "res5"),
        out_channels=16,
        top_block="p6p7",
    )
    x = jnp.ones((1, 128, 128, 3), jnp.float32)
    variables = fpn.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    feats = fpn.apply(variables, x, train=False)
    assert set(feats) == {"p3", "p4", "p5", "p6", "p7"}
    assert feats["p7"].shape[1] == feats["p5"].shape[1] // 4
    s = fpn_strides(("res3", "res4", "res5"), top_block="p6p7")
    assert s["p7"] == 128


# -------------------------------------------------------------- clustering
def test_kmeans_separates_blobs():
    from lvc_tpu.data.cluster.clustering import Kmeans, run_kmeans

    rng = np.random.RandomState(0)
    a = rng.randn(40, 8) * 0.1 + 5.0
    b = rng.randn(40, 8) * 0.1 - 5.0
    data = np.concatenate([a, b]).astype(np.float32)
    labels, loss = run_kmeans(data, 2, n_iter=10)
    assert len(set(labels[:40])) == 1 and len(set(labels[40:])) == 1
    assert labels[0] != labels[40]

    km = Kmeans(2, pca_dim=4)
    km.cluster(data)
    sizes = sorted(len(l) for l in km.images_lists)
    assert sizes == [40, 40]


# -------------------------------------------------------------- PreciseBN
def test_update_bn_stats_averages_moments():
    import flax.linen as nn
    from lvc_tpu.engine.hooks import update_bn_stats
    from lvc_tpu.modeling.layers import SyncBatchNorm

    class M(nn.Module):
        @nn.compact
        def __call__(self, batch, train=False):
            return SyncBatchNorm(features=2, name="bn")(batch["x"], train=train)

    class FakeState:
        def __init__(self, params, batch_stats):
            self.params = params
            self.batch_stats = batch_stats

        def replace(self, **kw):
            return FakeState(self.params, kw.get("batch_stats", self.batch_stats))

    m = M()
    batch0 = {"x": jnp.zeros((4, 2), jnp.float32)}
    variables = m.init(jax.random.PRNGKey(0), batch0, train=True)
    state = FakeState(variables["params"], variables["batch_stats"])

    rng = np.random.RandomState(0)
    batches = [
        {"x": jnp.asarray(rng.rand(16, 2).astype(np.float32) + i)} for i in range(4)
    ]
    new_state = update_bn_stats(m, state, iter(batches))
    data = np.concatenate([np.asarray(b["x"]) for b in batches])
    got_mean = np.asarray(
        jax.tree_util.tree_leaves(
            {k: v for k, v in new_state.batch_stats.items()}
        )[0]
    )
    # running_mean should approximate the mean of per-batch means
    per_batch = np.stack([np.asarray(b["x"]).mean(0) for b in batches]).mean(0)
    flat = new_state.batch_stats["bn"]["running_mean"]
    np.testing.assert_allclose(np.asarray(flat), per_batch, rtol=1e-4, atol=1e-4)


# -------------------------------------------------------------------- TTA
def test_tta_mapper_and_merge():
    from lvc_tpu.config import get_cfg
    from lvc_tpu.modeling.test_time_augmentation import (
        DatasetMapperTTA,
        _boxes_to_original,
        merge_tta_detections,
    )

    cfg = get_cfg()
    cfg.TEST.AUG.MIN_SIZES = (64, 96)
    cfg.TEST.AUG.MAX_SIZE = 200
    cfg.PAD.CANVAS_BUCKETS = [[128, 128], [256, 256]]
    mapper = DatasetMapperTTA(cfg)
    img = (np.random.RandomState(0).rand(100, 80, 3) * 255).astype(np.uint8)
    variants = mapper(img)
    assert len(variants) == 4  # 2 scales x {id, flip}

    # flip mapping round-trip: a box at the left edge maps to the right edge
    v = variants[1]
    assert v["tta_flip"]
    w = v["tta_width"]
    scale = v["tta_scale"]
    box = np.array([[0.0, 0.0, 10.0, 10.0]], np.float32)
    back = _boxes_to_original(box, scale, True, w)
    assert np.isclose(back[0, 2], 80.0, atol=1.0)  # right edge of original

    # merge: two near-identical boxes of the same class collapse to one
    boxes = jnp.asarray([[0, 0, 10, 10], [0.5, 0, 10, 10], [40, 40, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    classes = jnp.asarray([1, 1, 2], jnp.int32)
    valid = jnp.ones((3,), bool)
    b, s, c, ok = merge_tta_detections(boxes, scores, classes, valid, 0.5, 10)
    assert int(np.asarray(ok).sum()) == 2


# ------------------------------------------------------------------- utils
def test_colormap_and_visualizer(tmp_path):
    from lvc_tpu.utils.colormap import colormap, random_color
    from lvc_tpu.utils.visualizer import Visualizer

    cm = colormap(rgb=True)
    assert cm.shape == (80, 3)
    assert len(np.unique(cm, axis=0)) > 70  # visually distinct
    _ = random_color(seed=1)

    img = np.zeros((50, 50, 3), np.uint8)
    vis = Visualizer(img, metadata={"thing_classes": ["cat", "dog"]})
    out = vis.draw_instance_predictions(
        np.array([[5, 5, 30, 30]], np.float32),
        np.array([0.9], np.float32),
        np.array([1], np.int32),
        masks=np.ones((1, 50, 50), bool),
    )
    arr = out.get_image()
    assert arr.shape == (50, 50, 3)
    assert arr.sum() > 0  # something was drawn
    out.save(str(tmp_path / "vis.png"))


def test_retry_if_oom_passthrough_and_raise():
    from lvc_tpu.utils.memory import retry_if_oom

    @retry_if_oom
    def ok(x):
        return x + 1

    assert ok(1) == 2

    @retry_if_oom
    def bad():
        raise ValueError("not oom")

    with pytest.raises(ValueError):
        bad()


def test_logger_helpers(capsys):
    import logging

    from lvc_tpu.utils.logger import log_every_n, log_first_n, setup_logger

    lg = setup_logger(name="lvc_tpu_test")
    for _ in range(5):
        log_first_n(logging.INFO, "hello-first", n=2, name="lvc_tpu_test")
    for _ in range(4):
        log_every_n(logging.INFO, "hello-every", n=2, name="lvc_tpu_test")
    out = capsys.readouterr().out
    assert out.count("hello-first") == 2
    assert out.count("hello-every") == 2
