"""LVIS evaluator: frequency splits (APr/APc/APf) + dispatch.

Counterpart checks for reference lvc/evaluation/lvis_evaluation.py:150.
"""
import json
import numpy as np
import pytest

from lvc_tpu.evaluation.lvis_evaluation import LVISEvaluator
from lvc_tpu.data.catalog import MetadataCatalog


def _synthetic_lvis(tmp_path, name):
    cats = [
        {"id": 1, "name": "rare_cat", "frequency": "r"},
        {"id": 5, "name": "common_cat", "frequency": "c"},
        {"id": 9, "name": "freq_cat", "frequency": "f"},
    ]
    images, anns = [], []
    aid = 1
    for i in range(4):
        images.append({"id": i + 1, "height": 100, "width": 100,
                       "neg_category_ids": [], "not_exhaustive_category_ids": []})
        for j, cid in enumerate([1, 5, 9]):
            anns.append({
                "id": aid, "image_id": i + 1, "category_id": cid,
                "bbox": [10 + 25 * j, 10, 20, 20], "area": 400, "iscrowd": 0,
            })
            aid += 1
    ds = {"images": images, "annotations": anns, "categories": cats}
    p = tmp_path / "lvis.json"
    p.write_text(json.dumps(ds))
    md = MetadataCatalog.get(name)
    md.set(json_file=str(p), evaluator_type="lvis")
    return ds


def _pred_rows(ds, skip_cat=None):
    rows = []
    cat_ids = sorted(c["id"] for c in ds["categories"])
    for a in ds["annotations"]:
        if a["category_id"] == skip_cat:
            continue
        rows.append({
            "image_id": a["image_id"],
            "category_id": cat_ids.index(a["category_id"]),  # contiguous
            "bbox": list(a["bbox"]),
            "score": 0.9,
        })
    return rows


def test_lvis_frequency_splits_perfect(tmp_path):
    ds = _synthetic_lvis(tmp_path, "lvis_synth_perfect")
    ev = LVISEvaluator("lvis_synth_perfect")
    ev._predictions = _pred_rows(ds)
    res = ev.evaluate()["bbox"]
    for k in ("AP", "APr", "APc", "APf"):
        assert res[k] == pytest.approx(100.0), (k, res)


def test_lvis_frequency_splits_rare_missed(tmp_path):
    ds = _synthetic_lvis(tmp_path, "lvis_synth_miss")
    ev = LVISEvaluator("lvis_synth_miss")
    ev._predictions = _pred_rows(ds, skip_cat=1)  # drop every rare det
    res = ev.evaluate()["bbox"]
    assert res["APr"] == pytest.approx(0.0)
    assert res["APc"] == pytest.approx(100.0)
    assert res["APf"] == pytest.approx(100.0)
    assert res["AP"] == pytest.approx(100 * 2 / 3, rel=1e-3)


def test_train_net_dispatches_lvis(tmp_path):
    _synthetic_lvis(tmp_path, "lvis_synth_dispatch")
    import sys
    sys.path.insert(0, "tools")
    try:
        from train_net import Trainer
    finally:
        sys.path.pop(0)
    from lvc_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    ev = Trainer.build_evaluator(cfg, "lvis_synth_dispatch")
    assert type(ev).__name__ == "LVISEvaluator"
