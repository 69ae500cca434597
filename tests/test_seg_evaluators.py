"""SemSeg (mIoU), Panoptic (PQ), and Cityscapes evaluators."""
import json
import os

import numpy as np
import pytest

from lvc_tpu.evaluation.sem_seg_evaluation import SemSegEvaluator
from lvc_tpu.evaluation.panoptic_evaluation import COCOPanopticEvaluator, pq_single_image


def test_sem_seg_perfect_miou_100():
    ev = SemSegEvaluator(num_classes=3)
    gt = np.array([[0, 1], [2, 255]])
    ev.process(gt, gt)
    res = ev.evaluate()["sem_seg"]
    assert res["mIoU"] == pytest.approx(100.0)
    assert res["pACC"] == pytest.approx(100.0)


def test_sem_seg_known_confusion():
    ev = SemSegEvaluator(num_classes=2)
    gt = np.zeros((4, 4), np.int64)
    pred = np.zeros((4, 4), np.int64)
    pred[0] = 1  # 4 of 16 class-0 pixels predicted as class 1
    ev.process(pred, gt)
    res = ev.evaluate()["sem_seg"]
    # class0: tp=12, fn=0?? gt all 0: pos_gt0=16, tp0=12 -> IoU0 = 12/16
    assert res["IoU-0"] == pytest.approx(75.0)
    assert res["pACC"] == pytest.approx(75.0)
    # class1: tp=0, pred=4 -> IoU 0
    assert res["IoU-1"] == pytest.approx(0.0)
    assert res["mIoU"] == pytest.approx(37.5)


def test_sem_seg_ignore_label_excluded():
    ev = SemSegEvaluator(num_classes=2)
    gt = np.full((4, 4), 255, np.int64)
    gt[0, 0] = 1
    pred = np.ones((4, 4), np.int64)  # wrong everywhere except the one pixel
    ev.process(pred, gt)
    res = ev.evaluate()["sem_seg"]
    assert res["pACC"] == pytest.approx(100.0)


def test_pq_perfect_and_mismatch():
    pan = np.zeros((10, 10), np.int32)
    pan[:5] = 1
    pan[5:] = 2
    segs = [
        {"id": 1, "category_id": 7, "isthing": True},
        {"id": 2, "category_id": 3, "isthing": False},
    ]
    ev = COCOPanopticEvaluator(thing_category_ids=[7], stuff_category_ids=[3])
    ev.process(pan, segs, pan, segs)
    res = ev.evaluate()["panoptic_seg"]
    assert res["PQ"] == pytest.approx(100.0)
    assert res["PQ_th"] == pytest.approx(100.0)
    assert res["PQ_st"] == pytest.approx(100.0)

    # shifted prediction: IoU for seg1 vs gt1 = 40/60 = 0.667 -> TP with SQ 66.7
    pred = np.zeros((10, 10), np.int32)
    pred[1:6] = 1
    pred[6:] = 2
    ev2 = COCOPanopticEvaluator()
    ev2.process(pan, segs, pred, segs)
    r2 = ev2.evaluate()["panoptic_seg"]
    assert 0 < r2["PQ"] < 100


def test_pq_fp_fn_counting():
    pan_gt = np.zeros((8, 8), np.int32)
    pan_gt[:4] = 1  # gt segment cat 5 (rows 0-3)
    pan_gt[4:6] = 9  # gt segment cat 6 (rows 4-5)
    gt_segs = [{"id": 1, "category_id": 5}, {"id": 9, "category_id": 6}]
    pan_pred = np.zeros((8, 8), np.int32)
    pan_pred[4:6] = 3  # pred seg cat 5 entirely over the cat-6 gt -> real FP
    pan_pred[6:] = 4  # pred seg over void only -> excused (panopticapi rule)
    pred_segs = [{"id": 3, "category_id": 5}, {"id": 4, "category_id": 5}]
    stats = pq_single_image(pan_gt, gt_segs, pan_pred, pred_segs)
    assert stats[5]["tp"] == 0
    assert stats[5]["fn"] == 1  # unmatched gt seg 1
    assert stats[5]["fp"] == 1  # seg 3 counts, void-covered seg 4 excused
    assert stats[6]["fn"] == 1  # unmatched gt seg 9


def test_cityscapes_loader_and_instance_eval(tmp_path):
    from lvc_tpu.data.cityscapes import load_cityscapes_instances
    from lvc_tpu.evaluation.cityscapes_evaluation import CityscapesInstanceEvaluator
    from lvc_tpu.modeling.roi_heads.fast_rcnn import Detections

    # synthetic cityscapes layout: one city, one frame
    img_dir = tmp_path / "leftImg8bit" / "val" / "felsburg"
    gt_dir = tmp_path / "gtFine" / "val" / "felsburg"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    (img_dir / "felsburg_000000_000019_leftImg8bit.png").write_bytes(b"")
    poly = {
        "imgHeight": 100,
        "imgWidth": 200,
        "objects": [
            {"label": "car", "polygon": [[10, 10], [50, 10], [50, 40], [10, 40]]},
            {"label": "sky", "polygon": [[0, 0], [200, 0], [200, 5], [0, 5]]},
            {"label": "person", "polygon": [[60, 20], [80, 20], [80, 70], [60, 70]]},
        ],
    }
    with open(gt_dir / "felsburg_000000_000019_gtFine_polygons.json", "w") as f:
        json.dump(poly, f)

    dicts = load_cityscapes_instances(
        str(tmp_path / "leftImg8bit" / "val"), str(tmp_path / "gtFine" / "val")
    )
    assert len(dicts) == 1
    annos = dicts[0]["annotations"]
    assert len(annos) == 2  # sky is not a thing class
    assert {a["category_id"] for a in annos} == {0, 2}  # person, car

    # perfect detections -> AP 100
    ev = CityscapesInstanceEvaluator()
    gt_boxes = np.array([[10, 10, 50, 40], [60, 20, 80, 70]], np.float32)
    gt_classes = np.array([2, 0])
    dets = Detections(
        boxes=gt_boxes,
        scores=np.array([0.9, 0.8], np.float32),
        classes=gt_classes,
        valid=np.array([True, True]),
        proposal_idx=np.array([0, 1]),
    )
    ev.process_image(0, (100, 200), gt_boxes, gt_classes, dets)
    res = ev.evaluate()["bbox"]
    assert res["AP"] == pytest.approx(100.0)
    assert res["AP50"] == pytest.approx(100.0)


def test_pq_crowd_handling():
    """panopticapi crowd rules: crowd gt excluded from matching and FN;
    unmatched preds overlapping void+same-class-crowd > 0.5 are excused."""
    pan_gt = np.zeros((10, 10), np.int32)
    pan_gt[:5] = 1          # crowd gt, category 7
    pan_gt[5:8] = 2         # normal gt, category 7
    pan_pred = np.zeros((10, 10), np.int32)
    pan_pred[:5] = 11       # pred over crowd region only, category 7
    pan_pred[5:8] = 12      # pred matching normal gt, category 7
    segments_gt = [
        {"id": 1, "category_id": 7, "iscrowd": 1},
        {"id": 2, "category_id": 7},
    ]
    segments_pred = [
        {"id": 11, "category_id": 7},
        {"id": 12, "category_id": 7},
    ]
    stats = pq_single_image(pan_gt, segments_gt, pan_pred, segments_pred)
    s = stats[7]
    # crowd gt is not FN, pred 11 is excused by crowd overlap, pred 12 is TP
    assert s["tp"] == 1 and s["fp"] == 0 and s["fn"] == 0

    # same pred over the crowd region but with a DIFFERENT category is a
    # real FP (crowd excusal is same-category only)
    segments_pred2 = [
        {"id": 11, "category_id": 9},
        {"id": 12, "category_id": 7},
    ]
    stats2 = pq_single_image(pan_gt, segments_gt, pan_pred, segments_pred2)
    assert stats2[9]["fp"] == 1
