"""LVIS detection evaluation.

Counterpart of lvc/evaluation/lvis_evaluation.py (LVISEvaluator:18). LVIS
protocol differences from COCO handled here: maxDets=300 with no per-class
cap proxying, per-image negative/not-exhaustive category lists turn
unverifiable detections into ignores rather than false positives.
Built on the same COCOeval core.
"""
from __future__ import annotations

import copy
import json
import logging
import os
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

from lvc_tpu.data.catalog import MetadataCatalog
from lvc_tpu.data.coco_api import COCO
from lvc_tpu.evaluation.coco_eval import COCOeval
from lvc_tpu.evaluation.coco_evaluation import detections_to_coco_json

logger = logging.getLogger(__name__)


class LVISEval(COCOeval):
    """COCOeval with LVIS params and neg/not-exhaustive ignore handling."""

    def __init__(self, cocoGt=None, cocoDt=None, iouType="bbox"):
        super().__init__(cocoGt, cocoDt, iouType)
        self.params.maxDets = [300]
        # per-image category knowledge
        self._img_neg: Dict[int, set] = {}
        self._img_nex: Dict[int, set] = {}
        if cocoGt is not None:
            for img_id, img in cocoGt.imgs.items():
                self._img_neg[img_id] = set(img.get("neg_category_ids", []))
                self._img_nex[img_id] = set(img.get("not_exhaustive_category_ids", []))

    def evaluateImg(self, imgId, catId, aRng, maxDet):
        out = super().evaluateImg(imgId, catId, aRng, maxDet)
        if out is None:
            return None
        # LVIS: on images where the category is neither positively nor
        # negatively annotated, unmatched detections are ignored
        has_gt = len(out["gtIds"]) > 0
        neg = catId in self._img_neg.get(imgId, set())
        nex = catId in self._img_nex.get(imgId, set())
        if (not has_gt and not neg) or nex:
            dtIg = np.asarray(out["dtIgnore"])
            dtm = np.asarray(out["dtMatches"])
            out["dtIgnore"] = np.logical_or(dtIg, dtm == 0)
        return out

    def summarize(self):
        md = self.params.maxDets[-1]
        self.stats = np.array(
            [
                self._summarize(1, maxDets=md),
                self._summarize(1, iouThr=0.5, maxDets=md),
                self._summarize(1, iouThr=0.75, maxDets=md),
                self._summarize(1, areaRng="small", maxDets=md),
                self._summarize(1, areaRng="medium", maxDets=md),
                self._summarize(1, areaRng="large", maxDets=md),
                self._summarize(0, maxDets=md),
                self._summarize(0, maxDets=md),
                self._summarize(0, maxDets=md),
                self._summarize(0, areaRng="small", maxDets=md),
                self._summarize(0, areaRng="medium", maxDets=md),
                self._summarize(0, areaRng="large", maxDets=md),
            ]
        )
        return self.stats


class LVISEvaluator:
    def __init__(self, dataset_name: str, cfg=None, output_dir: Optional[str] = None):
        self._dataset_name = dataset_name
        self._output_dir = output_dir
        self._metadata = MetadataCatalog.get(dataset_name)
        json_file = self._metadata.get("json_file")
        self._api = COCO(json_file) if json_file and os.path.isfile(json_file) else COCO()
        self._do_evaluation = "annotations" in self._api.dataset
        self._predictions: List[dict] = []

    def reset(self):
        self._predictions = []

    def process_detections(self, dets, metas: List[dict]):
        import jax

        dets = jax.tree_util.tree_map(np.asarray, dets)
        for i, meta in enumerate(metas):
            if meta.get("padding"):
                continue
            from lvc_tpu.modeling.roi_heads.fast_rcnn import index_detections
            one = index_detections(dets, i)
            self._predictions.extend(detections_to_coco_json(one, meta))

    def evaluate(self) -> OrderedDict:
        from lvc_tpu.utils import comm

        if comm.get_world_size() > 1:
            shards = comm.all_gather_objects(self._predictions)
            if not comm.is_main_process():
                return OrderedDict()
            self._predictions = [r for shard in shards for r in shard]
        results = copy.deepcopy(self._predictions)
        # contiguous -> LVIS category ids (sorted order at registration)
        cat_ids = sorted(self._api.cats.keys()) if self._api.cats else []
        for r in results:
            if cat_ids:
                r["category_id"] = cat_ids[r["category_id"]]
        if self._output_dir:
            os.makedirs(self._output_dir, exist_ok=True)
            with open(os.path.join(self._output_dir, "lvis_instances_results.json"), "w") as f:
                json.dump(results, f)
        out = OrderedDict()
        if not self._do_evaluation or not results:
            return out
        lvis_dt = self._api.loadRes(results)
        ev = LVISEval(self._api, lvis_dt)
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        metrics = ["AP", "AP50", "AP75", "APs", "APm", "APl"]
        out["bbox"] = {m: float(ev.stats[i] * 100) for i, m in enumerate(metrics)}
        out["bbox"].update(self._frequency_splits(ev, cat_ids))
        logger.info("LVIS eval: %s", out["bbox"])
        return out

    def _frequency_splits(self, ev, cat_ids) -> Dict[str, float]:
        """APr/APc/APf: AP averaged over rare/common/frequent categories
        (reference lvc/evaluation/lvis_evaluation.py:150 via the lvis API).
        Frequency comes from the category's ``frequency`` field (LVIS v1)
        or is derived from ``image_count`` (rare 1-10, common 11-100,
        frequent >100 — the LVIS paper's definition)."""
        # precision: (T, R, K, A, M); area "all" = 0, last maxDets
        prec = ev.eval["precision"][:, :, :, 0, -1]  # (T, R, K)
        per_cat = np.full(prec.shape[2], np.nan)
        for k in range(prec.shape[2]):
            p = prec[:, :, k]
            p = p[p > -1]
            if p.size:
                per_cat[k] = p.mean()

        def freq_of(cat):
            f = cat.get("frequency")
            if f:
                return f
            n = cat.get("image_count", 0)
            return "r" if n <= 10 else ("c" if n <= 100 else "f")

        groups = {"r": [], "c": [], "f": []}
        for k, cid in enumerate(cat_ids):
            groups[freq_of(self._api.cats[cid])].append(per_cat[k])
        out = {}
        for key, name in (("r", "APr"), ("c", "APc"), ("f", "APf")):
            vals = [v for v in groups[key] if not np.isnan(v)]
            out[name] = float(np.mean(vals) * 100) if vals else float("nan")
        return out
