"""Visualizer surface tests (reference detectron2/utils/visualizer.py).

Pixel-exact image comparison is not the goal — these pin that every drawing
path runs, touches the canvas where expected, and respects the mask/keypoint/
panoptic formats the rest of the stack produces.
"""
import numpy as np
import pytest

from lvc_tpu.structures.masks import bitmask_to_rle, polygons_to_bitmask, rle_to_bitmask
from lvc_tpu.utils.visualizer import (
    ColorMode,
    GenericMask,
    KEYPOINT_CONNECTION_RULES,
    Visualizer,
    _create_text_labels,
    _PanopticPrediction,
)


def _img(h=64, w=80):
    return np.full((h, w, 3), 127, np.uint8)


def test_rle_roundtrip_and_empty_and_full():
    rng = np.random.RandomState(3)
    for m in [
        rng.rand(9, 14) > 0.5,
        np.zeros((5, 7), bool),
        np.ones((5, 7), bool),
        np.eye(6, dtype=bool),
    ]:
        assert (rle_to_bitmask(bitmask_to_rle(m)) == m).all()


def test_generic_mask_three_formats():
    poly = [[10, 10, 40, 10, 40, 30, 10, 30]]
    gm_poly = GenericMask(poly, 64, 80)
    bit = polygons_to_bitmask([np.asarray(poly[0])], 64, 80)
    gm_bit = GenericMask(bit, 64, 80)
    gm_rle = GenericMask(bitmask_to_rle(bit), 64, 80)
    assert (gm_poly.mask == bit).all()
    assert (gm_bit.mask == bit).all()
    assert (gm_rle.mask == bit).all()
    assert gm_poly.polygons and not gm_bit.polygons
    np.testing.assert_allclose(gm_bit.bbox(), [10, 10, 41, 31])
    assert gm_bit.area() == bit.sum()


def test_draw_instance_predictions_with_masks_and_keypoints():
    h, w = 64, 80
    masks = np.zeros((2, h, w), bool)
    masks[0, 5:20, 5:25] = True
    masks[1, 30:60, 40:75] = True
    kpts = np.zeros((2, 17, 3))
    kpts[0, 0] = [12, 8, 2]  # nose
    kpts[0, 5] = [8, 14, 2]  # left_shoulder
    kpts[0, 6] = [16, 14, 2]  # right_shoulder
    vis = Visualizer(_img(h, w), metadata={"thing_classes": ["cat", "dog"]})
    out = vis.draw_instance_predictions(
        boxes=np.array([[5, 5, 25, 20], [40, 30, 75, 60]], np.float32),
        scores=np.array([0.9, 0.7]),
        classes=np.array([0, 1]),
        masks=masks,
        keypoints=kpts,
    )
    arr = out.get_image()
    assert arr.shape == (h, w, 3)
    # mask overlays moved pixels inside both mask regions
    assert (arr[10, 10] != 127).any()
    assert (arr[45, 60] != 127).any()


def test_color_modes():
    img = np.zeros((32, 32, 3), np.uint8)
    img[:, :, 0] = 200  # red-ish: grayscale conversion changes it
    for mode in (ColorMode.IMAGE, ColorMode.SEGMENTATION, ColorMode.IMAGE_BW):
        vis = Visualizer(img, metadata={"thing_classes": ["x"]}, instance_mode=mode)
        out = vis.draw_instance_predictions(
            boxes=np.array([[4, 4, 20, 20]], np.float32),
            scores=np.array([0.5]),
            classes=np.array([0]),
        )
        assert out.get_image().shape == (32, 32, 3)
    bw = Visualizer(img, instance_mode=ColorMode.IMAGE_BW)
    bw._create_grayscale_image()
    g = np.asarray(bw.img)
    assert (g[..., 0] == g[..., 1]).all() and (g[..., 1] == g[..., 2]).all()


def test_draw_sem_seg_uses_stuff_metadata():
    sem = np.zeros((48, 48), np.int32)
    sem[:24] = 1
    sem[24:, :24] = 255  # ignore label: stays untouched
    vis = Visualizer(
        _img(48, 48),
        metadata={"stuff_classes": ["sky", "road"], "ignore_label": 255},
    )
    arr = vis.draw_sem_seg(sem, alpha=1.0).get_image()
    assert (arr[5, 40] != 127).any()  # class 1 region painted
    assert (arr[40, 5] == 127).all()  # ignore region untouched


def test_panoptic_prediction_and_drawing():
    seg = np.zeros((40, 40), np.int32)
    seg[:20] = 1  # stuff
    seg[25:35, 25:35] = 2  # thing
    info = [
        {"id": 1, "isthing": False, "category_id": 0},
        {"id": 2, "isthing": True, "category_id": 3, "score": 0.8},
    ]
    pred = _PanopticPrediction(seg, info)
    sem = list(pred.semantic_masks())
    inst = list(pred.instance_masks())
    assert len(sem) == 1 and len(inst) == 1
    assert sem[0][0].sum() == 20 * 40
    assert inst[0][1]["category_id"] == 3
    # id 0 pixels belong to no segment
    assert pred.non_empty_mask().sum() == (40 * 40 - 20 * 40 - 100)

    vis = Visualizer(_img(40, 40), metadata={"stuff_classes": ["sky"]})
    arr = vis.draw_panoptic_seg_predictions(seg, info).get_image()
    assert (arr[30, 30] != 127).any()


def test_draw_dataset_dict_with_segmentation_keypoints_flags():
    bit = np.zeros((64, 80), bool)
    bit[10:25, 10:30] = True
    dic = {
        "annotations": [
            {
                "bbox": [10, 10, 20, 15],
                "category_id": 0,
                "segmentation": [[10, 10, 30, 10, 30, 25, 10, 25]],
                "keypoints": [15, 15, 2] + [0, 0, 0] * 16,
            },
            {
                "bbox": [40, 30, 30, 25],
                "category_id": 1,
                "segmentation": bitmask_to_rle(bit),
                "iscrowd": 1,
            },
            {"bbox": [1, 1, 10, 10], "category_id": 0, "ignore_qe": True},
        ]
    }
    vis = Visualizer(_img(), metadata={"thing_classes": ["cat", "dog"]})
    arr = vis.draw_dataset_dict(dic).get_image()
    assert arr.shape == (64, 80, 3)
    assert (arr != 127).any()


def test_rotated_instances_and_primitives():
    vis = Visualizer(_img())
    vis.draw_circle((10, 10))
    vis.draw_line([5, 30], [40, 40], color=(255, 0, 0))
    vis.draw_polygon(np.array([[50, 10], [70, 10], [60, 30]]), color=(0, 0, 255))
    out = vis.overlay_rotated_instances(
        boxes=np.array([[40.0, 32.0, 30.0, 16.0, 30.0]]), labels=["obj 55%"]
    )
    arr = out.get_image()
    assert (arr[40, 17] != 127).any()  # line pixel


def test_keypoint_skeleton_connects_named_pairs():
    kp = np.zeros((17, 3))
    names = ("left_shoulder", "left_elbow")
    from lvc_tpu.structures.keypoints import COCO_PERSON_KEYPOINT_NAMES

    i0 = COCO_PERSON_KEYPOINT_NAMES.index(names[0])
    i1 = COCO_PERSON_KEYPOINT_NAMES.index(names[1])
    kp[i0] = [10, 10, 2]
    kp[i1] = [10, 40, 2]
    vis = Visualizer(_img())
    vis.draw_and_connect_keypoints(kp)
    arr = np.asarray(vis.img)
    rule_color = next(c for a, b, c in KEYPOINT_CONNECTION_RULES if {a, b} == set(names))
    assert (arr[25, 10] == rule_color).all()  # midpoint of the limb line


def test_create_text_labels():
    assert _create_text_labels([0, 1], [0.5, 0.25], ["a", "b"]) == ["a 50%", "b 25%"]
    assert _create_text_labels(None, [0.5], None) == ["50%"]
    assert _create_text_labels([0], None, ["a"]) == ["a"]
    assert _create_text_labels(None, None, None) is None


def test_scale_resizes_output():
    vis = Visualizer(_img(64, 80), scale=2.0)
    out = vis.draw_instance_predictions(
        boxes=np.array([[5, 5, 25, 20]], np.float32),
        scores=np.array([0.9]),
        classes=np.array([0]),
        masks=np.ones((1, 64, 80), bool),
    )
    assert out.get_image().shape == (128, 160, 3)
