"""Tests for the per-box crop datasets/loaders (rpn_coco, MapDatasetCrop,
DatasetMapperCrop, crop/exemplar loaders) and the proposal filters."""
import json
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from lvc_tpu.config import get_cfg
from lvc_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from lvc_tpu.data.meta_coco import load_coco_json


@pytest.fixture(scope="module")
def crop_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("cropds")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(1)
    images, annotations = [], []
    ann_id = 1
    for i in range(3):
        h, w = 100, 120
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        fname = f"img_{i}.jpg"
        Image.fromarray(arr).save(img_dir / fname)
        images.append({"id": i + 1, "file_name": fname, "height": h, "width": w})
        for _ in range(2):
            bw, bh = rng.randint(15, 40, 2)
            x, y = rng.randint(0, w - bw), rng.randint(0, h - bh)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 1,
                    "category_id": 1,
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "widget"}]}
    json_path = root / "instances.json"
    json_path.write_text(json.dumps(gt))

    name = "crop_test_dataset"
    metadata = {"thing_classes": ["widget"],
                "thing_dataset_id_to_contiguous_id": {1: 0}}
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name, lambda: load_coco_json(str(json_path), str(img_dir), metadata, name)
        )
        MetadataCatalog.get(name).set(
            json_file=str(json_path), image_root=str(img_dir),
            evaluator_type="coco", **metadata,
        )

    # proposal pkl aligned with the dataset (RPNEvaluator output format)
    ids = [d["id"] for d in images]
    prop = {
        "ids": ids,
        "boxes": [
            np.array([[5, 5, 60, 60], [10, 10, 80, 90], [0, 0, 119, 99]], np.float32)
            for _ in ids
        ],
        "objectness_logits": [np.array([3.0, 2.0, 1.0], np.float32) for _ in ids],
    }
    prop_path = root / "proposals.pkl"
    with open(prop_path, "wb") as f:
        pickle.dump(prop, f)
    return name, str(json_path), str(img_dir), str(prop_path)


def _cfg(name, prop_path):
    cfg = get_cfg()
    cfg.DATASETS.TEST = (name,)
    cfg.DATASETS.FS_TRAIN = (name,)
    cfg.DATASETS.UNSEEN_CLASSES = []
    cfg.DATASETS.PROPOSAL_FILES_TEST = (prop_path,)
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.DATALOADER.PROPOSALS.IOU_THRESH = 2.0  # keep everything
    return cfg


def test_map_dataset_crop_index_math():
    from lvc_tpu.data.crop import MapDatasetCrop

    calls = []
    ds = [{"n": 2}, {"n": 3}, {"n": 1}]
    m = MapDatasetCrop(ds, [2, 3, 1], lambda d, i: calls.append((d["n"], i)) or (d["n"], i))
    assert len(m) == 6
    out = [m[i] for i in range(6)]
    assert out == [(2, 0), (2, 1), (3, 0), (3, 1), (3, 2), (1, 0)]


def test_crop_shots_loader(crop_fixture):
    from lvc_tpu.data.crop import build_crop_shots_loader

    name, _, _, prop = crop_fixture
    cfg = _cfg(name, prop)
    loader = build_crop_shots_loader(cfg)
    batches = list(loader)
    total = sum(b["image"].shape[0] for b in batches)
    assert total == 6  # 3 images x 2 annotations
    b0 = batches[0]
    assert b0["image"].shape[1:] == (224, 224, 3)
    assert "annotation" in b0 and "bbox" in b0["annotation"][0]


def test_crop_test_loader_with_proposals(crop_fixture):
    from lvc_tpu.data.crop import build_crop_test_loader

    name, _, _, prop = crop_fixture
    cfg = _cfg(name, prop)
    loader = build_crop_test_loader(cfg, name)
    batches = list(loader)
    total = sum(b["image"].shape[0] for b in batches)
    assert total == 9  # 3 images x 3 proposals
    assert batches[0]["image"].shape[1:] == (224, 224, 3)
    assert "proposal_box" in batches[0]

    # overlap removal: with a low threshold, proposals overlapping gt drop
    cfg2 = _cfg(name, prop)
    cfg2.DATALOADER.PROPOSALS.IOU_THRESH = 1e-6
    loader2 = build_crop_test_loader(cfg2, name)
    total2 = sum(b["image"].shape[0] for b in loader2)
    assert total2 < total


def test_exemplar_loader_injects_shot(crop_fixture):
    from lvc_tpu.data.crop import build_crop_exem_loader

    name, _, _, prop = crop_fixture
    cfg = _cfg(name, prop)
    loader = build_crop_exem_loader(cfg, name)
    batches = list(loader)
    assert batches, "no batches produced"
    for b in batches:
        assert b["image"].shape[0] == cfg.SOLVER.IMS_PER_BATCH
        # last element is the injected shot (annotation mode)
        assert b["annotation"][-1] is not None
        assert all(p is not None for p in b["proposal_box"][:-1])


def test_rpn_coco_pkl_roundtrip(crop_fixture, tmp_path):
    from lvc_tpu.data.crop import load_coco_rpn_pkl, register_rpn_coco

    name, json_path, img_dir, _ = crop_fixture
    gt = json.load(open(json_path))
    pkl_path = tmp_path / "coco_style.pkl"
    with open(pkl_path, "wb") as f:
        pickle.dump(gt, f)
    dicts = load_coco_rpn_pkl(str(pkl_path), img_dir)
    assert len(dicts) == 3
    assert all(len(d["annotations"]) == 2 for d in dicts)
    assert all("id" in a for d in dicts for a in d["annotations"])

    register_rpn_coco("rpn_pkl_test_ds", {"thing_classes": ["widget"]},
                      img_dir, str(pkl_path))
    loaded = DatasetCatalog.get("rpn_pkl_test_ds")
    assert len(loaded) == 3


def test_filter_proposal_boxes():
    from lvc_tpu.data.utils import filter_proposal_boxes

    d = {
        "height": 100,
        "width": 100,
        "proposal_boxes": np.array(
            [[0, 0, 10, 10], [0, 0, 90, 90], [0, 0, 3, 3]], np.float32
        ),
        "proposal_objectness_logits": np.array([1.0, 2.0, 3.0], np.float32),
    }
    out = filter_proposal_boxes([d], area_rng=(50.0, 5000.0))[0]
    # 100-px and 8100-px boxes: only the 100-px one is within (50, 5000]
    assert len(out["proposal_boxes"]) == 1
    np.testing.assert_allclose(out["proposal_boxes"][0], [0, 0, 10, 10])
    assert out["proposal_objectness_logits"][0] == 1.0
