"""Loader-side space-to-depth input pipeline (INPUT.LOADER_S2D).

The production path emits ``image_s2d`` — normalize + pad-to-canvas + 3px
conv pad + 2x2 space-to-depth fused into one host pass
(transforms.s2d_canvas) — instead of a raw padded canvas that the device
must normalize and relayout. These tests pin:
  * bit-identity of the fused pass with the composed pipeline
    (layers.space_to_depth_host over the zero-padded canvas),
  * the mapper/collate key contract under INPUT.LOADER_S2D on/off/auto,
  * numeric equivalence of the ResNet stem on either representation
    (same parameters, reference 7x7/s2/p3 conv semantics,
    detectron2/modeling/backbone/resnet.py:564).
"""
import numpy as np
import pytest

from lvc_tpu.config import get_cfg
from lvc_tpu.data import transforms as T
from lvc_tpu.data.dataset_mapper import DatasetMapper, collate, wants_loader_s2d
from lvc_tpu.modeling.layers import space_to_depth_host

MEAN = (103.53, 116.28, 123.675)
STD = (57.375, 57.12, 58.395)


def _composed(image_f32: np.ndarray, canvas_hw, mean, std) -> np.ndarray:
    """The pre-existing two-step pipeline: zero-pad to canvas, then
    space_to_depth_host (normalize + 3px pad + 2x2 s2d)."""
    H, W = canvas_hw
    padded = np.zeros((H, W, 3), np.float32)
    padded[: image_f32.shape[0], : image_f32.shape[1]] = image_f32
    return space_to_depth_host(padded, mean, std)


@pytest.mark.parametrize(
    "hw", [(64, 64), (37, 51), (64, 1), (1, 64), (63, 64), (2, 2)]
)
def test_s2d_canvas_bit_identical_to_composed(hw):
    rng = np.random.RandomState(0)
    h, w = hw
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    out = T.s2d_canvas(img, (64, 64), MEAN, STD)
    ref = _composed(img.astype(np.float32), (64, 64), MEAN, STD)
    assert out.shape == ref.shape == (35, 35, 12)
    np.testing.assert_array_equal(out, ref)


def test_s2d_canvas_accepts_flipped_view():
    # hflip returns a negative-stride view; s2d_canvas must read it correctly
    rng = np.random.RandomState(1)
    img = (rng.rand(40, 60, 3).astype(np.float32) * 255).round()
    flipped, _ = T.hflip(img, None)
    assert flipped.strides[1] < 0  # really a view
    out = T.s2d_canvas(flipped, (64, 64), MEAN, STD)
    ref = _composed(np.ascontiguousarray(flipped), (64, 64), MEAN, STD)
    np.testing.assert_array_equal(out, ref)


def _cfg(mode: str):
    cfg = get_cfg()
    cfg.INPUT.LOADER_S2D = mode
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.PAD.CANVAS_BUCKETS = [[128, 128]]
    cfg.PAD.MAX_GT_PER_IMAGE = 10
    cfg.MODEL.PIXEL_MEAN = list(MEAN)
    cfg.MODEL.PIXEL_STD = list(STD)
    return cfg


def test_wants_loader_s2d_modes():
    cfg = _cfg("auto")
    assert "resnet" in cfg.MODEL.BACKBONE.NAME  # default backbone
    assert wants_loader_s2d(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GDL"  # not an s2d consumer
    assert not wants_loader_s2d(cfg)
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.NAME = "build_swin_fpn_backbone"
    assert not wants_loader_s2d(cfg)
    cfg.INPUT.LOADER_S2D = "on"
    assert wants_loader_s2d(cfg)
    cfg.INPUT.LOADER_S2D = "off"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    assert not wants_loader_s2d(cfg)


def test_mapper_and_collate_s2d_contract():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (100, 80, 3)).astype(np.uint8)
    d = {
        "height": 100,
        "width": 80,
        "annotations": [
            {"bbox": [10, 10, 30, 40], "bbox_mode": 0, "category_id": 0}
        ],
    }
    on = DatasetMapper(_cfg("on"), is_train=False)._map_loaded(dict(d), img)
    off = DatasetMapper(_cfg("off"), is_train=False)._map_loaded(dict(d), img)
    assert "image_s2d" in on and "image" not in on
    assert "image" in off and "image_s2d" not in off
    # the s2d tensor is exactly the composed transform of the raw canvas
    np.testing.assert_array_equal(
        on["image_s2d"], space_to_depth_host(off["image"], MEAN, STD)
    )
    np.testing.assert_array_equal(on["gt_boxes"], off["gt_boxes"])
    np.testing.assert_array_equal(on["image_size"], off["image_size"])

    batch = collate([on, on], train=False)
    assert batch["image_s2d"].shape[0] == 2 and "image" not in batch
    batch_gt = collate([on, on], train=True)
    assert "gt_boxes" in batch_gt and "image_s2d" in batch_gt
    batch_off = collate([off, off], train=False)
    assert batch_off["image"].shape == (2, 128, 128, 3)


def test_stem_equivalent_on_either_representation():
    import jax
    import jax.numpy as jnp
    from lvc_tpu.modeling.backbone.resnet import BasicStem

    rng = np.random.RandomState(3)
    img = (rng.rand(30, 27, 3).astype(np.float32) * 255).round()
    canvas = np.zeros((32, 32, 3), np.float32)
    canvas[:30, :27] = img
    raw = (jnp.asarray(canvas)[None] - jnp.asarray(MEAN)) / jnp.asarray(STD)
    s2d = jnp.asarray(T.s2d_canvas(img, (32, 32), MEAN, STD))[None]

    stem = BasicStem(out_channels=8, norm="")
    params = stem.init(jax.random.PRNGKey(0), raw)
    y_raw = stem.apply(params, raw)
    y_s2d = stem.apply(params, s2d)
    assert y_raw.shape == y_s2d.shape
    np.testing.assert_allclose(np.asarray(y_raw), np.asarray(y_s2d), rtol=1e-5, atol=1e-5)
