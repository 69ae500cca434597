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
    # cache hit returns the same object; the ann dict itself stays clean
    cache = {}
    first = _ann_mask_bits(ann_rle, H, W, cache)[0]
    assert _ann_mask_bits(ann_rle, H, W, cache)[0] is first
    assert "_mask_bits" not in ann_rle


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


def _batched_dets(img_rects, H, W):
    """Detections batched (B=len(img_rects)) whose boxes cover the given
    rects exactly; all-ones roi masks paste to the box interior."""
    from lvc_tpu.modeling.roi_heads.fast_rcnn import Detections

    B, D, M = len(img_rects), 3, 28
    boxes = np.zeros((B, D, 4), np.float32)
    scores = np.zeros((B, D), np.float32)
    classes = np.zeros((B, D), np.int64)
    valid = np.zeros((B, D), bool)
    for b, rect_list in enumerate(img_rects):
        for j, (cls, (y0, x0, y1, x1)) in enumerate(rect_list):
            boxes[b, j] = [x0, y0, x1, y1]
            scores[b, j] = 0.9 - 0.1 * j
            classes[b, j] = cls
            valid[b, j] = True
    return Detections(
        boxes=boxes,
        scores=scores,
        classes=classes,
        valid=valid,
        proposal_idx=np.tile(np.arange(D), (B, 1)),
        masks=np.ones((B, D, M, M), np.float32),
        keypoints=None,
    )


def test_detections_to_coco_json_maps_category_ids():
    """detections_to_coco_json applies the contiguous->dataset id map at
    process time (reference lvc/evaluation/coco_evaluation.py:96-117)."""
    import json

    from lvc_tpu.evaluation.coco_evaluation import detections_to_coco_json
    from lvc_tpu.modeling.roi_heads.fast_rcnn import index_detections

    H, W = 32, 48
    gt, rects = _gt_dataset(H, W)
    img_rects = [[(cat - 1, r) for (img, cat), r in rects.items() if img == 1]]
    dets = index_detections(_batched_dets(img_rects, H, W), 0)
    meta = {"image_id": 1, "image_size": (H, W), "orig_size": (H, W)}
    rows = detections_to_coco_json(dets, meta, reverse_id_map={0: 1, 1: 2})
    assert len(rows) == 2 and all("segmentation" in r for r in rows)
    assert sorted(r["category_id"] for r in rows) == [1, 2]
    json.dumps(rows)  # must be serializable

    ev = COCOeval(gt, gt.loadRes(rows), iouType="segm")
    ev.params.imgIds = [1]
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    # pasted all-ones roi masks fade in the border half-pixel (zeros
    # padding), so IoU is marginally below 1 but above every threshold
    assert ev.stats[0] > 0.99


def test_evaluator_reports_segm_task(tmp_path):
    """End-to-end COCOEvaluator with masks: register a synthetic dataset,
    process_detections -> evaluate, segm AP ~ 100 for perfect masks
    (VERDICT r2 next #1: the evaluator-level mask-AP path)."""
    import json

    from lvc_tpu.data.catalog import MetadataCatalog
    from lvc_tpu.evaluation.coco_evaluation import COCOEvaluator

    H, W = 32, 48
    gt, rects = _gt_dataset(H, W)
    gt_path = tmp_path / "segm_gt.json"
    gt_path.write_text(json.dumps(gt.dataset))
    name = "segm_synth_val"
    MetadataCatalog.get(name).set(
        json_file=str(gt_path),
        thing_classes=["a", "b"],
        thing_dataset_id_to_contiguous_id={1: 0, 2: 1},
        evaluator_type="coco",
    )

    per_img = {1: [], 2: []}
    for (img, cat), r in rects.items():
        per_img[img].append((cat - 1, r))
    dets = _batched_dets([per_img[1], per_img[2]], H, W)
    metas = [
        {"image_id": i, "image_size": (H, W), "orig_size": (H, W)}
        for i in (1, 2)
    ]

    ev = COCOEvaluator(name, output_dir=str(tmp_path / "out"))
    ev.reset()
    ev.process_detections(dets, metas)
    results = ev.evaluate()
    assert "segm" in results and "bbox" in results
    assert results["bbox"]["AP"] > 99
    assert results["segm"]["AP"] > 99
    # written rows carry dataset category ids
    written = json.loads(
        (tmp_path / "out" / "coco_instances_test_results.json").read_text()
    )
    assert {r["category_id"] for r in written} == {1, 2}
