"""C++-accelerated COCOeval (counterpart of the reference's
detectron2/evaluation/fast_eval_api.py + csrc/cocoeval/cocoeval.cpp).

``COCOeval_opt`` keeps IoU computation vectorized in numpy and moves the
greedy per-(image, category) matching across all thresholds AND area
ranges into one native call. Falls back to the pure-python COCOeval when
the shared library can't be built. Build happens lazily with g++ and is
cached next to the source.
"""
from __future__ import annotations

import ctypes
import logging
import os
from typing import Optional

import numpy as np

from lvc_tpu.evaluation.coco_eval import COCOeval
from lvc_tpu.utils.native_build import build_shared_lib

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "csrc")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_CSRC, "cocoeval.cpp")
    try:
        lib_path = build_shared_lib("cocoeval", src)
        if lib_path is None:
            raise RuntimeError("compilation failed")
        lib = ctypes.CDLL(lib_path)
        lib.cocoeval_evaluate_img.restype = None
        lib.cocoeval_evaluate_img.argtypes = [
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
            np.ctypeslib.ndpointer(np.uint8, flags="C"),
        ]
        _LIB = lib
        logger.info("Loaded native COCOeval kernel from %s", lib_path)
    except Exception as e:  # g++ missing, sandboxed, etc. -> python fallback
        logger.warning("Native COCOeval unavailable (%s); using python path", e)
        _LIB = None
    return _LIB


class COCOeval_opt(COCOeval):
    """Same interface/results as COCOeval; native matching when available."""

    def evaluate(self):
        lib = _load_lib()
        if lib is None:
            return super().evaluate()
        p = self.params
        p.imgIds = list(np.unique(p.imgIds))
        p.catIds = list(np.unique(p.catIds)) if p.useCats else [-1]
        self._prepare()
        self.ious = {
            (imgId, catId): self.computeIoU(imgId, catId)
            for imgId in p.imgIds
            for catId in p.catIds
        }

        T = len(p.iouThrs)
        A = len(p.areaRng)
        maxDet = p.maxDets[-1]
        thrs = np.ascontiguousarray(p.iouThrs, np.float64)
        area_rng = np.ascontiguousarray(np.asarray(p.areaRng, np.float64))
        self.evalImgs = {}

        for catId in p.catIds:
            for imgId in p.imgIds:
                gt = self._gts[imgId, catId]
                dt = self._dts[imgId, catId]
                if len(gt) == 0 and len(dt) == 0:
                    for aRng in p.areaRng:
                        self.evalImgs[(imgId, catId, tuple(aRng))] = None
                    continue
                dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
                dt_sorted = [dt[i] for i in dtind[:maxDet]]
                D, G = len(dt_sorted), len(gt)
                ious = np.ascontiguousarray(
                    np.asarray(self.ious[imgId, catId], np.float64).reshape(
                        min(len(dt), maxDet) if len(dt) else 0, G
                    )
                    if len(self.ious[imgId, catId])
                    else np.zeros((D, G))
                )
                gt_area = np.ascontiguousarray([g["area"] for g in gt], np.float64)
                gt_ign = np.ascontiguousarray([g["ignore"] for g in gt], np.uint8)
                gt_crowd = np.ascontiguousarray(
                    [g.get("iscrowd", 0) for g in gt], np.uint8
                )
                dt_area = np.ascontiguousarray([d["area"] for d in dt_sorted], np.float64)

                dtm = np.zeros((A, T, D), np.int64)
                gtm = np.zeros((A, T, G), np.int64)
                dt_ig = np.zeros((A, T, D), np.uint8)
                gt_ig = np.zeros((A, G), np.uint8)
                lib.cocoeval_evaluate_img(
                    T, thrs, D, G, ious, gt_area, gt_ign, gt_crowd, dt_area,
                    A, area_rng, dtm, gtm, dt_ig, gt_ig,
                )

                gt_ids = np.array([g["id"] for g in gt], np.int64)
                dt_ids = [d["id"] for d in dt_sorted]
                for a, aRng in enumerate(p.areaRng):
                    # map matched original gt index -> gt id (0 stays 0)
                    dtm_ids = np.where(
                        dtm[a] > 0, gt_ids[np.clip(dtm[a] - 1, 0, max(G - 1, 0))], 0
                    ).astype(np.float64) if G else np.zeros((T, D))
                    self.evalImgs[(imgId, catId, tuple(aRng))] = {
                        "image_id": imgId,
                        "category_id": catId,
                        "aRng": aRng,
                        "maxDet": maxDet,
                        "dtIds": dt_ids,
                        "gtIds": [g["id"] for g in gt],
                        "dtMatches": dtm_ids,
                        "gtMatches": gtm[a].astype(np.float64),
                        "dtScores": [d["score"] for d in dt_sorted],
                        "gtIgnore": gt_ig[a].astype(np.float64),
                        "dtIgnore": dt_ig[a].astype(bool),
                    }
