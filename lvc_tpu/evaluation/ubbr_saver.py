"""UBBR corrected-box saver.

Counterpart of lvc/evaluation/coco_evaluation.py UBBRSaver:500-563 +
instances_to_coco_json_ubbr:606-642: writes corrected boxes (XYWH) with
the original box as ``bbox_orig`` and the preserved annotation ``id`` to
``<dataset json path with .json -> _ubbr.json>``.
"""
from __future__ import annotations

import json
import logging
import os
from collections import OrderedDict
from typing import List, Optional

import numpy as np

from lvc_tpu.data.catalog import MetadataCatalog

logger = logging.getLogger(__name__)


class UBBRSaver:
    def __init__(self, dataset_name: str, cfg=None, output_dir: Optional[str] = None):
        self._dataset_name = dataset_name  # for DT_PATH sets this IS the json path
        self._metadata = MetadataCatalog.get(dataset_name)
        self._results: List[dict] = []

    def reset(self):
        self._results = []

    def process_detections(self, out, metas: List[dict]):
        """out: RegOnlyOutput (boxes aligned to candidate slots)."""
        boxes = np.asarray(out.boxes, np.float64)
        classes = np.asarray(out.classes)
        valid = np.asarray(out.valid)
        for i, meta in enumerate(metas):
            if meta.get("padding"):
                continue
            rh, rw = [int(x) for x in meta["image_size"]]
            oh, ow = [int(x) for x in meta["orig_size"]]
            sx, sy = ow / rw, oh / rh
            ids = np.asarray(meta["gt_ids"])
            for k in range(boxes.shape[1]):
                if not valid[i, k]:
                    continue
                x0, y0, x1, y1 = boxes[i, k]
                x0, x1 = x0 * sx, x1 * sx
                y0, y1 = y0 * sy, y1 * sy
                orig = meta.get("gt_boxes_orig")
                row = {
                    "image_id": int(meta["image_id"]),
                    "category_id": int(classes[i, k]),
                    "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                    "id": int(ids[k]),
                }
                if orig is not None:
                    bx = np.asarray(orig[k], np.float64)
                    row["bbox_orig"] = [
                        float(bx[0]),
                        float(bx[1]),
                        float(bx[2] - bx[0]),
                        float(bx[3] - bx[1]),
                    ]
                self._results.append(row)

    def evaluate(self) -> OrderedDict:
        results = list(self._results)
        id_map = self._metadata.get("thing_dataset_id_to_contiguous_id")
        if id_map:
            reverse = {v: k for k, v in id_map.items()}
            for r in results:
                r["category_id"] = reverse.get(r["category_id"], r["category_id"])
        out_path = self._dataset_name.replace(".json", "_ubbr.json")
        with open(out_path, "w") as f:
            json.dump(results, f)
        logger.info("Saved %d corrected boxes to %s", len(results), out_path)
        return OrderedDict()
