"""COCO-style evaluation for rotated (XYWHA) detections.

Counterpart of the reference's ``detectron2/evaluation/rotated_coco_evaluation.py``
(204 LoC: ``RotatedCOCOeval`` + ``RotatedCOCOEvaluator``): the COCOeval
protocol is unchanged, but IoU between detections and ground truth uses the
rotated polygon-clip IoU, with axis-aligned (4-dim XYWH) ground truth
promoted to XYWHA with angle 0. Area-range filtering uses w*h like the
reference. Segmentation iouType is not supported (same as the reference).
"""
from __future__ import annotations

import copy
import json
import logging
import os
from collections import OrderedDict
from typing import List, Optional

import numpy as np

from lvc_tpu.evaluation.coco_eval import COCOeval
from lvc_tpu.evaluation.coco_evaluation import COCOEvaluator

logger = logging.getLogger(__name__)


def _to_xywha(boxes: np.ndarray) -> np.ndarray:
    """Promote (N, 4) XYWH rows to (N, 5) XYWHA (center form, angle 0);
    pass (N, 5) through unchanged (reference RotatedCOCOeval.convert_rle_...
    / boxlist conversion, rotated_coco_evaluation.py:34-71)."""
    boxes = np.asarray(boxes, np.float64)
    if boxes.shape[-1] == 5:
        return boxes
    cx = boxes[:, 0] + boxes[:, 2] / 2.0
    cy = boxes[:, 1] + boxes[:, 3] / 2.0
    return np.stack([cx, cy, boxes[:, 2], boxes[:, 3], np.zeros(len(boxes))], axis=1)


def rotated_iou_xywha(dets: np.ndarray, gts: np.ndarray, iscrowd: np.ndarray) -> np.ndarray:
    """(D, G) rotated IoU; crowd gt scores intersection / det area."""
    import jax.numpy as jnp

    from lvc_tpu.structures import rotated_boxes as rb

    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    d = jnp.asarray(_to_xywha(dets), jnp.float32)
    g = jnp.asarray(_to_xywha(gts), jnp.float32)
    inter = np.asarray(rb.pairwise_intersection_rotated(d, g), np.float64)
    darea = np.asarray(rb.area_rotated(d), np.float64)[:, None]
    garea = np.asarray(rb.area_rotated(g), np.float64)[None, :]
    union = np.where(np.asarray(iscrowd, bool)[None, :], darea, darea + garea - inter)
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


class RotatedCOCOeval(COCOeval):
    """COCOeval with rotated-box IoU (reference RotatedCOCOeval)."""

    def computeIoU(self, imgId, catId):
        p = self.params
        gt = self._gts[imgId, catId]
        dt = self._dts[imgId, catId]
        if len(gt) == 0 or len(dt) == 0:
            return np.zeros((len(dt), len(gt)))
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        if len(dt) > p.maxDets[-1]:
            dt = dt[: p.maxDets[-1]]
        d = np.array([x["bbox"] for x in dt], dtype=np.float64)
        g = np.array([x["bbox"] for x in gt], dtype=np.float64)
        iscrowd = np.array([x.get("iscrowd", 0) for x in gt], dtype=bool)
        return rotated_iou_xywha(d, g, iscrowd)


def rotated_detections_to_coco_json(dets, meta: dict) -> List[dict]:
    """One image's padded rotated Detections -> COCO rows with 5-dim bbox
    (XYWHA, absolute); centers/sizes rescale to the original image size,
    the angle is scale-invariant only for isotropic resize (the test-time
    resize is isotropic, matching the reference's assumption)."""
    rows = []
    boxes = np.asarray(dets.boxes, np.float64)
    scores = np.asarray(dets.scores, np.float64)
    classes = np.asarray(dets.classes)
    valid = np.asarray(dets.valid)
    rh, rw = [int(x) for x in meta["image_size"]]
    oh, ow = [int(x) for x in meta["orig_size"]]
    sx, sy = ow / rw, oh / rh
    for b, s, c, v in zip(boxes, scores, classes, valid):
        if not v:
            continue
        rows.append(
            {
                "image_id": int(meta["image_id"]),
                "category_id": int(c),
                "bbox": [b[0] * sx, b[1] * sy, b[2] * sx, b[3] * sy, float(b[4])],
                "score": float(s),
            }
        )
    return rows


class RotatedCOCOEvaluator(COCOEvaluator):
    """COCOEvaluator that keeps 5-dim boxes and evaluates with
    :class:`RotatedCOCOeval` (reference rotated_coco_evaluation.py:74-204)."""

    def process_detections(self, dets, metas: List[dict]):
        import jax

        dets = jax.tree_util.tree_map(np.asarray, dets)
        for i, meta in enumerate(metas):
            if meta.get("padding"):
                continue
            from lvc_tpu.modeling.roi_heads.fast_rcnn import index_detections
            one = index_detections(dets, i)
            self._predictions.extend(rotated_detections_to_coco_json(one, meta))

    def evaluate(self) -> "OrderedDict":
        from lvc_tpu.utils import comm

        if comm.get_world_size() > 1:
            shards = comm.all_gather_objects(self._predictions)
            if not comm.is_main_process():
                return OrderedDict()
            self._predictions = [r for shard in shards for r in shard]
        coco_results = copy.deepcopy(self._predictions)
        id_map = self._metadata.get("thing_dataset_id_to_contiguous_id")
        if id_map:
            reverse = {v: k for k, v in id_map.items()}
            for r in coco_results:
                r["category_id"] = reverse[r["category_id"]]
        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            path = os.path.join(self._output_dir, "coco_instances_results.json")
            with open(path, "w") as f:
                json.dump(coco_results, f)
        results = OrderedDict()
        if not self._do_evaluation or not coco_results:
            return results
        coco_dt = self._coco_api.loadRes(coco_results)
        coco_eval = RotatedCOCOeval(self._coco_api, coco_dt)
        coco_eval.evaluate()
        coco_eval.accumulate()
        coco_eval.summarize()
        results["bbox"] = self._derive_coco_results(
            coco_eval, class_names=self._metadata.get("thing_classes")
        )
        return results
