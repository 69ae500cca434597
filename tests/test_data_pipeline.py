"""End-to-end data pipeline + evaluator tests on a synthetic COCO dataset."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from lvc_tpu.config import get_cfg
from lvc_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from lvc_tpu.data.dataset_mapper import DatasetMapper, collate
from lvc_tpu.data.build import TestLoader, TrainLoader, get_detection_dataset_dicts
from lvc_tpu.data.meta_coco import load_coco_json


CATS = [{"id": 1, "name": "widget"}, {"id": 5, "name": "gadget"}]


@pytest.fixture(scope="module")
def synthetic_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    sizes = [(120, 160), (160, 120), (100, 100), (140, 90)]
    for i, (h, w) in enumerate(sizes):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        fname = f"img_{i}.jpg"
        Image.fromarray(arr).save(img_dir / fname)
        images.append({"id": i + 10, "file_name": fname, "height": h, "width": w})
        for _ in range(rng.randint(1, 4)):
            bw, bh = rng.randint(10, 40, 2)
            x, y = rng.randint(0, w - bw), rng.randint(0, h - bh)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": i + 10,
                    "category_id": [1, 5][rng.randint(2)],
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    gt = {"images": images, "annotations": annotations, "categories": CATS}
    json_path = root / "instances.json"
    json_path.write_text(json.dumps(gt))

    name = "synthetic_test_dataset"
    metadata = {
        "thing_classes": ["widget", "gadget"],
        "thing_dataset_id_to_contiguous_id": {1: 0, 5: 1},
    }
    if name not in DatasetCatalog:
        DatasetCatalog.register(
            name,
            lambda: load_coco_json(str(json_path), str(img_dir), metadata, name),
        )
        MetadataCatalog.get(name).set(
            json_file=str(json_path), image_root=str(img_dir), evaluator_type="coco", **metadata
        )
    return name, str(json_path)


def small_cfg():
    cfg = get_cfg()
    # these tests pin the raw padded-canvas contract; the production s2d
    # pipeline is covered by tests/test_loader_s2d.py
    cfg.INPUT.LOADER_S2D = "off"
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.PAD.CANVAS_BUCKETS = [[128, 128]]
    cfg.PAD.MAX_GT_PER_IMAGE = 10
    cfg.DATALOADER.NUM_WORKERS = 2
    return cfg


def test_dataset_dicts(synthetic_coco):
    name, _ = synthetic_coco
    dicts = get_detection_dataset_dicts([name])
    assert len(dicts) == 4
    d = dicts[0]
    assert os.path.isfile(d["file_name"])
    assert all("bbox" in a for a in d["annotations"])
    # contiguous category ids
    cids = {a["category_id"] for dd in dicts for a in dd["annotations"]}
    assert cids <= {0, 1}


def test_mapper_padding(synthetic_coco):
    name, _ = synthetic_coco
    cfg = small_cfg()
    dicts = get_detection_dataset_dicts([name])
    mapper = DatasetMapper(cfg, is_train=True)
    ex = mapper(dicts[0])
    assert ex["image"].shape == (128, 128, 3)
    assert ex["gt_boxes"].shape == (10, 4)
    n = ex["gt_valid"].sum()
    assert n == len(dicts[0]["annotations"])
    # boxes scaled into the resized image
    h, w = ex["image_size"]
    assert (ex["gt_boxes"][:n, 2] <= w + 1e-3).all()
    assert (ex["gt_boxes"][:n, 3] <= h + 1e-3).all()


def test_train_loader_batches(synthetic_coco):
    name, _ = synthetic_coco
    cfg = small_cfg()
    dicts = get_detection_dataset_dicts([name])
    mapper = DatasetMapper(cfg, is_train=True)
    loader = TrainLoader(dicts, mapper, batch_size=2, num_workers=2)
    it = iter(loader)
    batch = next(it)
    assert batch["image"].shape == (2, 128, 128, 3)
    assert batch["gt_boxes"].shape == (2, 10, 4)
    batch2 = next(it)
    assert batch2["image"].shape == (2, 128, 128, 3)


def test_test_loader_covers_all_images(synthetic_coco):
    name, _ = synthetic_coco
    cfg = small_cfg()
    dicts = get_detection_dataset_dicts([name])
    mapper = DatasetMapper(cfg, is_train=False)
    loader = TestLoader(dicts, mapper, batch_size=3)
    seen = []
    for batch, metas in loader:
        assert batch["image"].shape[0] == 3
        for m in metas:
            if not m["padding"]:
                seen.append(m["image_id"])
    assert sorted(seen) == [10, 11, 12, 13]


def test_evaluator_perfect_predictions(synthetic_coco):
    """Feed gt boxes as detections through the whole evaluator path."""
    from lvc_tpu.evaluation.coco_evaluation import COCOEvaluator
    from lvc_tpu.modeling.roi_heads.fast_rcnn import Detections

    name, json_path = synthetic_coco
    cfg = small_cfg()
    dicts = get_detection_dataset_dicts([name])
    mapper = DatasetMapper(cfg, is_train=False)
    evaluator = COCOEvaluator(name, cfg)
    evaluator.reset()
    for d in dicts:
        ex = mapper(d)
        n = int(ex["gt_valid"].sum())
        D = 10
        boxes = np.zeros((1, D, 4), np.float32)
        scores = np.zeros((1, D), np.float32)
        classes = np.zeros((1, D), np.int32)
        valid = np.zeros((1, D), bool)
        boxes[0, :n] = ex["gt_boxes"][:n]
        scores[0, :n] = 0.9
        classes[0, :n] = ex["gt_classes"][:n]
        valid[0, :n] = True
        dets = Detections(boxes, scores, classes, valid, np.zeros((1, D), np.int32))
        metas = [
            {
                "image_id": ex["image_id"],
                "orig_size": ex["orig_size"],
                "image_size": ex["image_size"],
                "padding": False,
            }
        ]
        evaluator.process_detections(dets, metas)
    results = evaluator.evaluate()
    assert results["bbox"]["AP"] > 99.0, results["bbox"]
    assert results["bbox"]["AP50"] > 99.0
