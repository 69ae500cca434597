import numpy as np

from lvc_tpu.data.mosaic import get_mosaic4, get_mosaic9
from lvc_tpu.evaluation.pascal_voc_evaluation import voc_ap, voc_eval_class
from lvc_tpu.structures.boxes import BoxMode


def _dicts_images(n, seed=0):
    rng = np.random.RandomState(seed)
    dicts, images = [], []
    for i in range(n):
        h, w = rng.randint(40, 80, 2)
        img = np.full((h, w, 3), i * 20 + 10, np.uint8)
        dicts.append(
            {
                "file_name": f"x{i}.jpg",
                "image_id": i,
                "height": h,
                "width": w,
                "annotations": [
                    {
                        "bbox": [5.0, 5.0, 20.0, 15.0],
                        "bbox_mode": BoxMode.XYWH_ABS,
                        "category_id": i % 3,
                        "iscrowd": 0,
                    }
                ],
            }
        )
        images.append(img)
    return dicts, images


def test_mosaic4_boxes_land_on_their_tiles():
    dicts, images = _dicts_images(4)
    image, merged = get_mosaic4(dicts, images)
    assert len(merged["annotations"]) == 4
    h, w = image.shape[:2]
    for a in merged["annotations"]:
        x0, y0, x1, y1 = a["bbox"]
        assert 0 <= x0 < x1 <= w + 1e-6
        assert 0 <= y0 < y1 <= h + 1e-6
        # pixel at the box center belongs to the source tile (not padding)
        cy, cx = int((y0 + y1) / 2), int((x0 + x1) / 2)
        assert image[cy, cx, 0] != 114


def test_mosaic9_shapes():
    dicts, images = _dicts_images(9, seed=1)
    image, merged = get_mosaic9(dicts, images)
    assert len(merged["annotations"]) == 9
    assert image.shape[0] <= 3 * 80 and image.shape[1] <= 3 * 80
    for a in merged["annotations"]:
        x0, y0, x1, y1 = a["bbox"]
        assert x1 > x0 and y1 > y0


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert np.isclose(voc_ap(rec, prec, use_07_metric=False), 1.0)
    assert np.isclose(voc_ap(rec, prec, use_07_metric=True), 1.0)


def test_voc_eval_class_basic():
    gt = {
        0: {"boxes": np.array([[10.0, 10.0, 30.0, 30.0]]), "difficult": np.array([False])},
        1: {"boxes": np.array([[0.0, 0.0, 20.0, 20.0]]), "difficult": np.array([False])},
    }
    dets = [
        {"image_id": 0, "bbox": [10, 10, 30, 30], "score": 0.9},
        {"image_id": 1, "bbox": [0, 0, 20, 20], "score": 0.8},
    ]
    assert np.isclose(voc_eval_class(dets, gt, use_07_metric=False), 1.0)
    # an extra false positive above the TPs halves early precision
    dets_fp = [{"image_id": 0, "bbox": [50, 50, 60, 60], "score": 0.95}] + dets
    ap = voc_eval_class(dets_fp, gt, use_07_metric=False)
    assert 0.5 < ap < 1.0


def test_voc_eval_difficult_ignored():
    gt = {
        0: {
            "boxes": np.array([[10.0, 10.0, 30.0, 30.0], [50.0, 50.0, 70.0, 70.0]]),
            "difficult": np.array([False, True]),
        }
    }
    dets = [
        {"image_id": 0, "bbox": [10, 10, 30, 30], "score": 0.9},
        {"image_id": 0, "bbox": [50, 50, 70, 70], "score": 0.8},  # matches difficult
    ]
    assert np.isclose(voc_eval_class(dets, gt), 1.0)
