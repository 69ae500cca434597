"""COCO segm (mask AP) evaluation: iouType="segm" through COCOeval and the
evaluator json path (reference: d2 evaluation/coco_evaluation.py:146-171 +
pycocotools maskUtils; our COCOeval computes mask IoU from packed bits)."""
import numpy as np

from lvc_tpu.data.coco_api import COCO
from lvc_tpu.evaluation.coco_eval import COCOeval, segm_iou, _ann_mask_bits
from lvc_tpu.structures.masks import bitmask_to_rle, paste_masks_np


def _rect_mask(h, w, y0, x0, y1, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def _gt_dataset(H=32, W=48):
    images = [{"id": 1, "height": H, "width": W}, {"id": 2, "height": H, "width": W}]
    cats = [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]
    anns = []
    rects = {
        (1, 1): (4, 6, 20, 26),
        (1, 2): (10, 30, 28, 44),
        (2, 1): (2, 2, 14, 18),
        (2, 2): (16, 20, 30, 40),
    }
    for i, ((img, cat), (y0, x0, y1, x1)) in enumerate(rects.items()):
        m = _rect_mask(H, W, y0, x0, y1, x1)
        anns.append(
            {
                "id": i + 1,
                "image_id": img,
                "category_id": cat,
                "segmentation": bitmask_to_rle(m),
                "bbox": [x0, y0, x1 - x0, y1 - y0],
                "area": float(m.sum()),
                "iscrowd": 0,
            }
        )
    gt = COCO()
    gt.dataset = {"images": images, "categories": cats, "annotations": anns}
    gt.createIndex()
    return gt, rects


def _res_row(img, cat, rect, H=32, W=48, score=0.9):
    y0, x0, y1, x1 = rect
    m = _rect_mask(H, W, y0, x0, y1, x1)
    return {
        "image_id": img,
        "category_id": cat,
        "bbox": [x0, y0, x1 - x0, y1 - y0],
        "score": score,
        "segmentation": bitmask_to_rle(m),
    }


def test_perfect_masks_give_ap_100():
    gt, rects = _gt_dataset()
    results = [_res_row(img, cat, r) for (img, cat), r in rects.items()]
    ev = COCOeval(gt, gt.loadRes(results), iouType="segm")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert abs(stats[0] - 1.0) < 1e-6


def test_shifted_masks_score_between_thresholds():
    gt, rects = _gt_dataset()
    # shift every mask by ~1/4 of its height: IoU in (0.5, 0.75) for the
    # first gt (16px tall, shift 4 -> IoU 12/20 = 0.6)
    results = []
    for (img, cat), (y0, x0, y1, x1) in rects.items():
        dy = (y1 - y0) // 4
        results.append(_res_row(img, cat, (y0 + dy, x0, y1 + dy, x1)))
    ev = COCOeval(gt, gt.loadRes(results), iouType="segm")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    ap50 = ev.stats[1]
    ap75 = ev.stats[2]
    assert abs(ap50 - 1.0) < 1e-6, ap50
    assert ap75 < 0.5, ap75


def test_segm_iou_crowd_uses_det_area():
    H, W = 16, 16
    dt = _rect_mask(H, W, 0, 0, 8, 8)  # area 64
    gtm = _rect_mask(H, W, 0, 0, 16, 16)  # area 256, covers dt
    def bits(m):
        return (np.packbits(m.reshape(-1)), int(m.sum()))
    iou_crowd = segm_iou([bits(dt)], [bits(gtm)], np.array([True]))
    iou_plain = segm_iou([bits(dt)], [bits(gtm)], np.array([False]))
    assert abs(iou_crowd[0, 0] - 1.0) < 1e-9  # inter / dt area
    assert abs(iou_plain[0, 0] - 64.0 / 256.0) < 1e-9


def test_ann_mask_bits_decodes_polygons_and_rle():
    H, W = 20, 30
    m = _rect_mask(H, W, 5, 5, 15, 25)
    ann_rle = {"segmentation": bitmask_to_rle(m)}
    bits, area = _ann_mask_bits(ann_rle, H, W)
    assert area == int(m.sum())
    ann_poly = {"segmentation": [[5.0, 5.0, 24.0, 5.0, 24.0, 14.0, 5.0, 14.0]]}
    bits_p, area_p = _ann_mask_bits(ann_poly, H, W)
    assert area_p > 0
    # cache hit returns the same object
    assert _ann_mask_bits(ann_rle, H, W)[0] is bits


def test_paste_masks_np_matches_device_paste():
    import jax.numpy as jnp

    from lvc_tpu.modeling.roi_heads.mask_head import paste_masks_in_image

    rng = np.random.RandomState(5)
    D, M, H, W = 8, 28, 40, 60
    masks = rng.rand(D, M, M).astype(np.float32)
    w = rng.uniform(4, 30, D)
    h = rng.uniform(4, 24, D)
    x0 = rng.uniform(-6, W - 6, D)
    y0 = rng.uniform(-6, H - 6, D)
    boxes = np.stack([x0, y0, x0 + w, y0 + h], -1).astype(np.float32)
    want = np.asarray(
        paste_masks_in_image(jnp.asarray(masks), jnp.asarray(boxes), (H, W), 0.5)
    )
    got = paste_masks_np(masks, boxes, (H, W), 0.5)
    np.testing.assert_array_equal(got, want)


def test_evaluator_reports_segm_task(tmp_path):
    """detections_to_coco_json emits RLEs; COCOEvaluator adds the segm
    task on the non-splits path."""
    import json

    from lvc_tpu.evaluation.coco_evaluation import detections_to_coco_json
    from lvc_tpu.modeling.roi_heads.fast_rcnn import Detections

    H, W = 32, 48
    gt, rects = _gt_dataset(H, W)
    # one image's detections covering its two gt rects exactly; roi-space
    # masks all ones -> pasted mask == box interior
    boxes = np.array(
        [[6, 4, 26, 20], [30, 10, 44, 28], [0, 0, 1, 1]], np.float32
    )
    dets = Detections(
        boxes=boxes,
        scores=np.array([0.9, 0.8, 0.1], np.float32),
        classes=np.array([0, 1, 0]),
        valid=np.array([True, True, False]),
        proposal_idx=np.arange(3),
        masks=np.ones((3, 28, 28), np.float32),
        keypoints=None,
    )
    meta = {"image_id": 1, "image_size": (H, W), "orig_size": (H, W)}
    rows = detections_to_coco_json(dets, meta)
    assert len(rows) == 2 and all("segmentation" in r for r in rows)
    json.dumps(rows)  # must be serializable

    ev = COCOeval(gt, gt.loadRes(rows), iouType="segm")
    ev.params.imgIds = [1]
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    # pasted all-ones roi masks fade in the border half-pixel (zeros
    # padding), so IoU is marginally below 1 but above every threshold
    assert ev.stats[0] > 0.99
