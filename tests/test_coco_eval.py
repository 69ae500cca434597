import numpy as np

from lvc_tpu.data.coco_api import COCO
from lvc_tpu.evaluation.coco_eval import COCOeval


def make_gt(annos, num_imgs=2, num_cats=2):
    return COCO(
        {
            "images": [{"id": i, "height": 100, "width": 100} for i in range(num_imgs)],
            "categories": [{"id": c + 1, "name": f"c{c+1}"} for c in range(num_cats)],
            "annotations": [
                {
                    "id": i + 1,
                    "image_id": a["image_id"],
                    "category_id": a["category_id"],
                    "bbox": a["bbox"],
                    "area": a["bbox"][2] * a["bbox"][3],
                    "iscrowd": a.get("iscrowd", 0),
                }
                for i, a in enumerate(annos)
            ],
        }
    )


def run_eval(gt, dets):
    dt = gt.loadRes(dets)
    E = COCOeval(gt, dt)
    E.evaluate()
    E.accumulate()
    return E.summarize()


def test_perfect_detection_ap1():
    gt = make_gt(
        [
            {"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20]},
            {"image_id": 1, "category_id": 2, "bbox": [30, 30, 40, 20]},
        ]
    )
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [10, 10, 20, 20], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [30, 30, 40, 20], "score": 0.8},
    ]
    stats = run_eval(gt, dets)
    assert np.isclose(stats[0], 1.0)  # AP
    assert np.isclose(stats[1], 1.0)  # AP50


def test_iou_06_matches_three_thresholds():
    # det IoU with gt is exactly 0.6 -> TP at thresholds 0.5, 0.55, 0.6
    gt = make_gt([{"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10]}], num_cats=1)
    # overlap: det [0,0,6,10] vs gt [0,0,10,10]: inter 60, union 100 -> 0.6
    dets = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 6, 10], "score": 0.9}]
    # make union right: det area 60, gt 100, inter 60 -> iou = 60/100 = 0.6
    stats = run_eval(gt, dets)
    assert np.isclose(stats[0], 0.3), stats[0]
    assert np.isclose(stats[1], 1.0)  # AP50


def test_false_positive_lowers_precision():
    gt = make_gt([{"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10]}], num_cats=1)
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9},
        {"image_id": 0, "category_id": 1, "bbox": [50, 50, 10, 10], "score": 0.95},
    ]
    # FP ranked above the TP: precision at recall 1 is 1/2
    stats = run_eval(gt, dets)
    assert np.isclose(stats[1], 0.5), stats[1]  # AP50


def test_crowd_gt_is_ignored_not_fp():
    gt = make_gt(
        [
            {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10]},
            {"image_id": 0, "category_id": 1, "bbox": [50, 50, 30, 30], "iscrowd": 1},
        ],
        num_cats=1,
    )
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9},
        # matches the crowd region -> ignored, not a false positive
        {"image_id": 0, "category_id": 1, "bbox": [52, 52, 26, 26], "score": 0.8},
    ]
    stats = run_eval(gt, dets)
    assert np.isclose(stats[1], 1.0), stats[1]


def test_missed_gt_lowers_recall():
    gt = make_gt(
        [
            {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10]},
            {"image_id": 0, "category_id": 1, "bbox": [40, 40, 10, 10]},
        ],
        num_cats=1,
    )
    dets = [{"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9}]
    stats = run_eval(gt, dets)
    # precision 1.0 up to recall 0.5, 0 beyond -> AP50 ~ 51/101
    assert np.isclose(stats[1], 51 / 101, atol=1e-6), stats[1]
    assert np.isclose(stats[8], 0.5)  # AR@100


def test_area_split_small_vs_large():
    gt = make_gt(
        [
            {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10]},     # small (100)
            {"image_id": 0, "category_id": 1, "bbox": [0, 0, 99, 99]},    # large (9801)
        ],
        num_cats=1,
    )
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10], "score": 0.9},
    ]
    stats = run_eval(gt, dets)
    assert np.isclose(stats[3], 1.0)   # APs: the small gt is found
    assert np.isclose(stats[5], 0.0)   # APl: the large gt is missed


def test_coco_api_indices():
    gt = make_gt(
        [
            {"image_id": 0, "category_id": 1, "bbox": [0, 0, 10, 10]},
            {"image_id": 0, "category_id": 2, "bbox": [5, 5, 10, 10]},
            {"image_id": 1, "category_id": 1, "bbox": [0, 0, 30, 30]},
        ]
    )
    assert sorted(gt.getImgIds()) == [0, 1]
    assert sorted(gt.getCatIds()) == [1, 2]
    assert gt.getAnnIds(imgIds=0) == [1, 2]
    assert gt.getAnnIds(catIds=1) == [1, 3]
    assert gt.getAnnIds(imgIds=0, catIds=2) == [2]
    assert gt.getAnnIds(areaRng=[200, 1000]) == [3]
    assert [a["id"] for a in gt.loadAnns([2])] == [2]
