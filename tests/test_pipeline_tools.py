"""Pipeline JSON tools: mining band selection + the three combine steps."""
import json
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from lvc_tpu.data.coco_api import COCO, COCO_PK


def make_det_json(tmp_path, n_imgs=4, cat_ids=(1, 5)):
    rng = np.random.RandomState(0)
    images = [
        {"id": i, "file_name": f"im{i}.jpg", "height": 100, "width": 100}
        for i in range(n_imgs)
    ]
    anns = []
    aid = 1
    for i in range(n_imgs):
        for c in cat_ids:
            for _ in range(3):
                w, h = rng.randint(10, 40, 2)
                x, y = rng.randint(0, 50, 2)
                anns.append(
                    {
                        "id": aid,
                        "image_id": i,
                        "category_id": c,
                        "bbox": [float(x), float(y), float(w), float(h)],
                        "area": float(w * h),
                        "score": float(rng.rand()),
                        "iscrowd": 0,
                    }
                )
                aid += 1
    gt = {
        "images": images,
        "annotations": anns,
        "categories": [{"id": c, "name": f"cat{c}"} for c in cat_ids],
    }
    p = tmp_path / "dets.json"
    p.write_text(json.dumps(gt))
    return str(p), gt


def test_coco_pk_ranged_ann_ids(tmp_path):
    path, gt = make_det_json(tmp_path)
    coco = COCO_PK(path)
    ids = coco.getAnnIds(catIds=1, scoreRng=[0.5, 1.0])
    anns = coco.loadAnns(ids)
    assert all(0.5 <= a["score"] < 1.0 for a in anns)
    assert all(a["category_id"] == 1 for a in anns)
    # area ratio index exists
    assert all("area_ratio" in a for a in coco.loadAnns(coco.getAnnIds()))
    ids2 = coco.getAnnIds(catIds=1, areaRatioRng=[0.0, 0.05])
    assert all(a["area_ratio"] < 0.05 for a in coco.loadAnns(ids2))


def test_mining_band_selection(tmp_path):
    from create_coco_dataset_from_dets_all import get_ret_anns

    path, gt = make_det_json(tmp_path)
    coco_dt = COCO_PK(path)
    args = types.SimpleNamespace(
        top=False, full=True, K_min=0.3, K_max=0.8, ar=0.0, all_cats=False
    )
    anns = get_ret_anns(coco_dt, {1: [], 5: []}, args, [1, 5])
    kept = [a for a in anns if not a["ignore_qe"]]
    ignored = [a for a in anns if a["ignore_qe"]]
    assert all(0.3 <= a["score"] < 0.8 for a in kept)
    # ignores are other dets of the same class on kept images
    kept_imgs = {(a["image_id"], a["category_id"]) for a in kept}
    for a in ignored:
        assert a["iscrowd"] == 1
        assert (a["image_id"], a["category_id"]) in kept_imgs
    # no duplicates
    assert len({a["id"] for a in anns}) == len(anns)


def test_combine_ubbr_with_qe(tmp_path):
    import combine_ubbr_with_qe as tool

    path, gt = make_det_json(tmp_path)
    # corrected boxes for first 3 ann ids
    ubbr = [
        {"id": 1, "bbox": [1.0, 2.0, 3.0, 4.0], "image_id": 0, "category_id": 1},
        {"id": 2, "bbox": [5.0, 6.0, 7.0, 8.0], "image_id": 0, "category_id": 1},
    ]
    up = tmp_path / "dets_ubbr.json"
    up.write_text(json.dumps(ubbr))
    out = tool.main(types.SimpleNamespace(ubbr_data=str(up), qe_data=path))
    assert out.endswith("_ubbr_id.json")
    data = json.loads(open(out).read())
    assert len(data["annotations"]) == 2
    by_id = {a["id"]: a for a in data["annotations"]}
    assert by_id[1]["bbox"] == [1.0, 2.0, 3.0, 4.0]


def test_combine_pseudo_with_ignore(tmp_path):
    import combine_pseudo_with_ignore as tool

    ig_path, gt = make_det_json(tmp_path)
    # pseudo data: a filtered COCO json with ignore_qe fields
    ps = json.loads(open(ig_path).read())
    for a in ps["annotations"]:
        a["ignore_qe"] = 0
    ps["annotations"] = ps["annotations"][:4]
    ps_path = tmp_path / "pseudo.json"
    ps_path.write_text(json.dumps(ps))
    out = tool.main(types.SimpleNamespace(ps_data=str(ps_path), ig_data=ig_path))
    data = json.loads(open(out).read())
    ids = [a["id"] for a in data["annotations"]]
    assert len(set(ids)) == len(ids)
    kept = [a for a in data["annotations"] if not a.get("ignore_qe")]
    ig = [a for a in data["annotations"] if a.get("ignore_qe")]
    assert len(kept) == 4 and len(ig) > 0


def test_combine_qe_with_base(tmp_path):
    import combine_qe_with_base as tool

    ps_path, gt = make_det_json(tmp_path)
    base = json.loads(open(ps_path).read())
    # base data uses a seen-class name
    base["categories"] = [{"id": 1, "name": "truck"}, {"id": 5, "name": "cat5"}]
    for a in base["annotations"]:
        a["id"] += 1000
    bs_path = tmp_path / "base.json"
    bs_path.write_text(json.dumps(base))
    out = tool.main(
        types.SimpleNamespace(ps_data=ps_path, bs_data=str(bs_path), base_ignore=True)
    )
    assert out.endswith("_wbase_base_ig.json")
    data = json.loads(open(out).read())
    added = [a for a in data["annotations"] if a["id"] > 1000]
    assert added and all(a["category_id"] == 1 for a in added)
    assert all(a["ignore_qe"] == 1.0 for a in added)
