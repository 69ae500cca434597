"""RPN proposal extraction + recall evaluation.

Counterpart of lvc/evaluation/rpn_evaluation.py (RPNEvaluator:27):
converts ProposalNetwork outputs to the pipeline's pickle format
``{ids, boxes (XYXY, score-sorted), objectness_logits}`` written as
``coco_proposals_{trainval|test}_results.pkl`` (:137-192), and reports
class-agnostic average recall (AR) over IoU 0.5:0.95 for all/base/novel
gt splits.
"""
from __future__ import annotations

import logging
import os
import pickle
from collections import OrderedDict, defaultdict
from typing import Dict, List, Optional

import numpy as np

from lvc_tpu.data.catalog import MetadataCatalog
from lvc_tpu.data.coco_api import COCO
from lvc_tpu.evaluation.coco_evaluation import BASE_CLASS_IDS, NOVEL_CLASS_IDS

logger = logging.getLogger(__name__)


def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(inter > 0, inter / np.maximum(union, 1e-12), 0.0)


def average_recall(gt_by_image: Dict[int, np.ndarray], props_by_image: Dict[int, np.ndarray],
                   max_dets: int = 1000) -> float:
    """Mean over IoU thresholds 0.5:0.05:0.95 of gt recall by the top
    ``max_dets`` proposals (COCO AR definition, greedy per-threshold
    matching)."""
    thrs = np.linspace(0.5, 0.95, 10)
    total_gt = 0
    matched = np.zeros(len(thrs))
    for iid, gts in gt_by_image.items():
        if len(gts) == 0:
            continue
        props = props_by_image.get(iid, np.zeros((0, 4)))[:max_dets]
        total_gt += len(gts)
        if len(props) == 0:
            continue
        ious = _iou_xyxy(props, gts)
        for ti, t in enumerate(thrs):
            # greedy: each proposal claims its best unmatched gt
            gt_taken = np.zeros(len(gts), bool)
            m = ious.copy()
            for d in range(len(props)):
                j = int(np.argmax(np.where(gt_taken, -1.0, m[d])))
                if m[d, j] >= t and not gt_taken[j]:
                    gt_taken[j] = True
            matched[ti] += gt_taken.sum()
    if total_gt == 0:
        return 0.0
    return float(np.mean(matched / total_gt))


class RPNEvaluator:
    def __init__(self, dataset_name: str, cfg=None, output_dir: Optional[str] = None):
        self._dataset_name = dataset_name
        self._output_dir = output_dir
        self._metadata = MetadataCatalog.get(dataset_name)
        json_file = self._metadata.get("json_file")
        self._coco_api = COCO(json_file) if json_file and os.path.isfile(json_file) else COCO()
        self._do_evaluation = "annotations" in self._coco_api.dataset
        self._training_set = "trainval" in dataset_name
        self._is_splits = any(s in dataset_name for s in ("all", "base", "novel"))
        self._props: Dict[int, np.ndarray] = {}
        self._logits: Dict[int, np.ndarray] = {}

    def reset(self):
        self._props = {}
        self._logits = {}

    def process_detections(self, outputs, metas: List[dict]):
        """outputs: ProposalNetwork dict with proposal_boxes (B, K, 4),
        objectness_logits (B, K), proposal_valid (B, K)."""
        boxes = np.asarray(outputs["proposal_boxes"], np.float64)
        logits = np.asarray(outputs["objectness_logits"], np.float64)
        valid = np.asarray(outputs["proposal_valid"])
        for i, meta in enumerate(metas):
            if meta.get("padding"):
                continue
            v = valid[i]
            b = boxes[i][v]
            s = logits[i][v]
            rh, rw = [int(x) for x in meta["image_size"]]
            oh, ow = [int(x) for x in meta["orig_size"]]
            b = b * np.array([ow / rw, oh / rh, ow / rw, oh / rh])
            order = np.argsort(-s, kind="stable")
            self._props[int(meta["image_id"])] = b[order]
            self._logits[int(meta["image_id"])] = s[order]

    def evaluate(self) -> OrderedDict:
        from lvc_tpu.utils import comm

        if comm.get_world_size() > 1:
            shards = comm.all_gather_objects((self._props, self._logits))
            if not comm.is_main_process():
                return OrderedDict()
            for props, logits in shards[1:]:
                self._props.update(props)
                self._logits.update(logits)
        save_dict = {
            "ids": list(self._props.keys()),
            "boxes": [self._props[i] for i in self._props],
            "objectness_logits": [self._logits[i] for i in self._props],
        }
        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            tag = "trainval" if "trainval" in self._dataset_name else "test"
            path = os.path.join(self._output_dir, f"coco_proposals_{tag}_results.pkl")
            with open(path, "wb") as f:
                pickle.dump(save_dict, f, protocol=pickle.HIGHEST_PROTOCOL)
            logger.info("Saved proposals to %s", path)

        results = OrderedDict()
        if not self._do_evaluation or self._training_set:
            return results

        # gt by image for each split
        def gt_split(cat_ids):
            out = defaultdict(list)
            for ann in self._coco_api.dataset.get("annotations", []):
                if ann.get("iscrowd", 0):
                    continue
                if cat_ids is not None and ann["category_id"] not in cat_ids:
                    continue
                x, y, w, h = ann["bbox"]
                out[ann["image_id"]].append([x, y, x + w, y + h])
            return {k: np.asarray(v) for k, v in out.items()}

        results["bbox"] = {}
        splits = [("", None)]
        if self._is_splits:
            splits = [("", None), ("b", set(BASE_CLASS_IDS)), ("n", set(NOVEL_CLASS_IDS))]
        for prefix, cats in splits:
            if prefix and "all" not in self._dataset_name:
                if (prefix == "b" and "base" not in self._dataset_name) or (
                    prefix == "n" and "novel" not in self._dataset_name
                ):
                    continue
            gts = gt_split(cats)
            for k in (100, 1000):
                results["bbox"][f"{prefix}AR@{k}"] = (
                    average_recall(gts, self._props, max_dets=k) * 100.0
                )
        return results
