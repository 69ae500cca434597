"""End-to-end LVC loop on a synthetic mini-COCO (VERDICT r1 weak #5).

Drives the ACTUAL tools/* mains in-process through the full pipeline of
``scripts/coco_full_run.sh`` (reference scripts/coco_full_run.sh): train a
detector, extract RPN proposals, train the cascade UBBR corrector on them,
extract detections, mine score-band candidates, kNN-verify them against the
shots, cascade-correct the verified boxes, run the three combine steps, and
retrain on the produced pseudo-annotation JSONs. Every stage consumes the
files the previous stage wrote, so format drift between stages fails here.

The synthetic dataset reuses the real COCO category table with annotations
for "person" (a novel/unseen class) and "truck" (a base/seen class), so the
tools' hard-coded seen/unseen tables apply unchanged; the canonical dataset
names (coco_trainval_all, coco_test_all, coco_trainval_all_30shot) are
re-registered to point at the mini data.
"""
import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import glob
import json
import os
import sys
from collections import Counter

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from lvc_tpu.config import get_cfg
from lvc_tpu.data.builtin_meta import _get_builtin_metadata
from lvc_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from lvc_tpu.data.meta_coco import load_coco_json

PERSON, TRUCK = 1, 8  # COCO ids: person is novel/unseen, truck is base/seen


def _coco_categories():
    meta = _get_builtin_metadata("coco_fewshot")
    inv = {v: k for k, v in meta["thing_dataset_id_to_contiguous_id"].items()}
    return [
        {"id": inv[i], "name": name} for i, name in enumerate(meta["thing_classes"])
    ]


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    root = tmp_path_factory.mktemp("lvc_loop")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(7)
    images, annotations = [], []
    ann_id = 1
    n_imgs = 8
    for i in range(n_imgs):
        h = w = 128
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        fname = f"img_{i}.jpg"
        Image.fromarray(arr).save(img_dir / fname)
        images.append({"id": 100 + i, "file_name": fname, "height": h, "width": w})
        for cat in (PERSON, TRUCK):
            bw, bh = rng.randint(20, 50, 2)
            x, y = rng.randint(0, w - bw), rng.randint(0, h - bh)
            annotations.append(
                {
                    "id": ann_id,
                    "image_id": 100 + i,
                    "category_id": cat,
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh),
                    "iscrowd": 0,
                }
            )
            ann_id += 1
    cats = _coco_categories()
    all_json = root / "instances_all.json"
    all_json.write_text(
        json.dumps({"images": images, "annotations": annotations, "categories": cats})
    )
    # few-shot gt: person annotations on the first 2 images only, so mining
    # still has 6 shot-free images to source candidates from
    shot_imgs = {100, 101}
    fs_anns = [
        a
        for a in annotations
        if a["category_id"] == PERSON and a["image_id"] in shot_imgs
    ]
    fs_json = root / "instances_30shot.json"
    fs_json.write_text(
        json.dumps(
            {
                "images": [im for im in images if im["id"] in shot_imgs],
                "annotations": fs_anns,
                "categories": cats,
            }
        )
    )

    meta = _get_builtin_metadata("coco_fewshot")
    for name, jf in [
        ("coco_trainval_all", all_json),
        ("coco_test_all", all_json),
        ("coco_trainval_all_30shot", fs_json),
    ]:
        if name in DatasetCatalog:
            DatasetCatalog.remove(name)
        # avoid the per-class K-shot file layout by passing a shot-free
        # loader-internal name
        DatasetCatalog.register(
            name,
            lambda jf=jf: load_coco_json(str(jf), str(img_dir), meta, "mini_fs"),
        )
        MetadataCatalog.get(name).set(
            json_file=str(jf),
            image_root=str(img_dir),
            evaluator_type="coco",
            **meta,
        )
    return {"root": str(root), "all_json": str(all_json), "fs_json": str(fs_json)}


def _make_init_weights(path):
    """Well-conditioned starting weights for the mini model, standing in for
    the ImageNet init the production chain starts from (the reference never
    trains from raw random init — MSRA-filled activations explode, see
    PARITY.md). Saved in torch layout so the chain also exercises
    checkpoint/convert.py."""
    import jax
    import torch

    from lvc_tpu.checkpoint.convert import flax_to_torch
    from lvc_tpu.modeling.meta_arch.build import build_model

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs", "Base-RCNN-FPN.yaml"))
    opts = _mini_opts("/tmp/unused")
    cfg.merge_from_list(opts[: opts.index("DATASETS.TRAIN")])
    model = build_model(cfg)
    import jax.numpy as jnp

    batch = {
        "image": jnp.zeros((1, 128, 128, 3), jnp.float32),
        "image_size": jnp.asarray([[128, 128]], np.int32),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in flax_to_torch(variables).items()
    }
    torch.save({"model": sd}, path)
    return path


def _mini_opts(out_dir, extra=()):
    """Config-override list shrinking the model/solver to test scale."""
    return [
        "MODEL.WEIGHTS", "",
        "MODEL.RESNETS.STEM_OUT_CHANNELS", "8",
        "MODEL.RESNETS.RES2_OUT_CHANNELS", "32",
        "MODEL.FPN.OUT_CHANNELS", "32",
        "MODEL.ROI_BOX_HEAD.FC_DIM", "64",
        "MODEL.RPN.PRE_NMS_TOPK_TRAIN", "256",
        "MODEL.RPN.POST_NMS_TOPK_TRAIN", "128",
        "MODEL.RPN.PRE_NMS_TOPK_TEST", "256",
        "MODEL.RPN.POST_NMS_TOPK_TEST", "128",
        "MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE", "32",
        "TEST.DETECTIONS_PER_IMAGE", "100",
        # random-init scores are ~1/81, below the default 0.05 threshold
        "MODEL.ROI_HEADS.SCORE_THRESH_TEST", "0.0",
        "INPUT.MIN_SIZE_TRAIN", "(128,)",
        "INPUT.MAX_SIZE_TRAIN", "128",
        "INPUT.MIN_SIZE_TEST", "128",
        "INPUT.MAX_SIZE_TEST", "128",
        "INPUT.CROP.ENABLED", "False",
        "PAD.CANVAS_BUCKETS", "[[128, 128]]",
        "PAD.MAX_GT_PER_IMAGE", "16",
        "DATALOADER.NUM_WORKERS", "0",
        "SOLVER.IMS_PER_BATCH", "2",
        "SOLVER.MAX_ITER", "2",
        "SOLVER.WARMUP_ITERS", "0",
        "SOLVER.CHECKPOINT_PERIOD", "2",
        # raw random init amplifies activations (see PARITY.md); clip +
        # tiny LR keep the 2-iter checkpoint finite for the eval stages
        "SOLVER.BASE_LR", "0.000001",
        "SOLVER.CLIP_GRADIENTS.ENABLED", "True",
        "SOLVER.CLIP_GRADIENTS.CLIP_TYPE", "norm",
        "SOLVER.CLIP_GRADIENTS.CLIP_VALUE", "1.0",
        "DATASETS.TRAIN", "('coco_trainval_all',)",
        "DATASETS.FS_TRAIN", "('coco_trainval_all',)",
        "DATASETS.TEST", "('coco_trainval_all',)",
        "OUTPUT_DIR", out_dir,
    ] + list(extra)


def _parse(tool_args):
    from lvc_tpu.engine.defaults import default_argument_parser

    return default_argument_parser().parse_args(tool_args)


def test_full_lvc_loop(mini_coco):
    root = mini_coco["root"]
    det_dir = os.path.join(root, "detector")
    ubbr_dir = os.path.join(root, "ubbr")
    retrain_dir = os.path.join(root, "retrain")
    base_yaml = os.path.join(REPO, "configs", "Base-RCNN-FPN.yaml")
    ubbr_yaml = os.path.join(
        REPO, "configs", "COCO-detection", "cascade_ubbr_R_50_FPN_base.yaml"
    )

    import train_net
    import train_net_reg
    import train_net_reg_qe
    import train_net_qe_ig
    import create_coco_dataset_from_dets_all as mine_tool
    import run_nearest_neighbours as knn_tool
    import combine_ubbr_with_qe
    import combine_pseudo_with_ignore
    import combine_qe_with_base

    # starting weights (stands in for the ImageNet .pkl of the real chain;
    # also exercises the torch-layout load through checkpoint/convert.py)
    init_pth = _make_init_weights(os.path.join(root, "init_weights.pth"))

    # ---- stage 1: train the detector (tools/train_net.py)
    train_net.main(
        _parse(
            ["--config-file", base_yaml, *_mini_opts(det_dir, ["MODEL.WEIGHTS", init_pth])]
        )
    )
    assert os.path.exists(os.path.join(det_dir, "last_checkpoint"))

    # ---- stage 6: extract RPN proposals (ProposalNetwork + RPNEvaluator)
    train_net.main(
        _parse(
            [
                "--config-file", base_yaml, "--resume", "--eval-only",
                *_mini_opts(
                    det_dir,
                    ["MODEL.META_ARCHITECTURE", "ProposalNetwork"],
                ),
            ]
        )
    )
    prop_pkl = os.path.join(det_dir, "coco_proposals_trainval_results.pkl")
    assert os.path.exists(prop_pkl)

    # ---- stage 8: train the cascade UBBR corrector on those proposals
    train_net_reg.main(
        _parse(
            [
                "--config-file", ubbr_yaml,
                *_mini_opts(
                    ubbr_dir,
                    [
                        "DATASETS.PROPOSAL_FILES_TRAIN", f"('{prop_pkl}',)",
                        "DATASETS.PROPOSAL_FILES_TEST", f"('{prop_pkl}',)",
                        "MODEL.ROI_HEADS.NUM_CLASSES", "80",
                        "MODEL.WEIGHTS", init_pth,
                    ],
                ),
            ]
        )
    )
    assert os.path.exists(os.path.join(ubbr_dir, "last_checkpoint"))
    # the corrector's IoU self-test wrote its report
    assert glob.glob(os.path.join(ubbr_dir, "inference", "results_*.json"))

    # ---- stage 10: extract detections on the training set
    train_net.main(
        _parse(["--config-file", base_yaml, "--resume", "--eval-only", *_mini_opts(det_dir)])
    )
    det_json = os.path.join(det_dir, "inference", "coco_instances_trainval_results.json")
    assert os.path.exists(det_json)
    assert len(json.load(open(det_json))) > 0

    # The random-init detector's class argmax is degenerate (one seen class
    # takes ~98% of the detections), which starves every downstream stage.
    # Deterministically respread the category ids over four unseen classes
    # plus one seen class; every other field (boxes, scores, image ids,
    # file format) is the real detector output, so format drift between
    # stages still fails the chain.
    dets = json.load(open(det_json))
    name2id = {c["name"]: c["id"] for c in _coco_categories()}
    spread = [name2id[n] for n in ("person", "car", "dog", "tv")] + [TRUCK]
    for i, d in enumerate(dets):
        d["category_id"] = spread[i % len(spread)]
    json.dump(dets, open(det_json, "w"))

    # ---- stage 11: mine score-band candidates. K-min sits at the median
    # detector score so --full also produces sub-band ignore annotations.
    k_min = sorted(d["score"] for d in dets)[len(dets) // 2]
    mine_args = mine_tool.parser.parse_args(
        [
            "--json-data", "coco_trainval_all",
            "--gt-data", "coco_trainval_all_30shot",
            "--full", "--K-min", str(k_min), "--K-max", "1.0",
            "--dt-path", det_json,
        ]
    )
    mined_json = mine_tool.main(mine_args)
    assert os.path.exists(mined_json)
    mined = json.load(open(mined_json))
    kept = [a for a in mined["annotations"] if not a.get("ignore_qe")]
    assert kept, "mining produced no candidates"
    # mining targets the full 20-class unseen table (reference
    # create_coco_dataset_from_dets_all.py:110-115), not just classes with
    # shots; person is one of them
    unseen_ids = {
        c["id"] for c in _coco_categories() if c["name"] in mine_tool.UNSEEN_CLASSES
    }
    assert all(a["category_id"] in unseen_ids for a in kept)
    # images holding few-shot annotations are excluded per class: no PERSON
    # candidate may come from the shot images
    assert all(
        a["image_id"] not in (100, 101) for a in kept if a["category_id"] == PERSON
    )
    assert any(a.get("ignore_qe") for a in mined["annotations"]), (
        "--full produced no sub-band ignore annotations"
    )

    # Re-point the 30-shot dataset at shots of the dominant mined class C
    # before verification (the catalog loader re-reads fs_json lazily, so
    # rewriting the file re-targets every later stage). With every shot of
    # class C, the kNN vote is C for every query, so verification
    # deterministically confirms exactly the class-C candidates independent
    # of the random-init descriptor geometry.
    dom_cls = Counter(a["category_id"] for a in kept).most_common(1)[0][0]
    dom = [a for a in kept if a["category_id"] == dom_cls][:4]
    all_data = json.load(open(mini_coco["all_json"]))
    shot_img_ids = {a["image_id"] for a in dom}
    json.dump(
        {
            "images": [im for im in all_data["images"] if im["id"] in shot_img_ids],
            "annotations": [
                {
                    "id": 10_000 + i,
                    "image_id": a["image_id"],
                    "category_id": dom_cls,
                    "bbox": a["bbox"],
                    "area": float(a["bbox"][2] * a["bbox"][3]),
                    "iscrowd": 0,
                }
                for i, a in enumerate(dom)
            ],
            "categories": all_data["categories"],
        },
        open(mini_coco["fs_json"], "w"),
    )

    # ---- stage 14: kNN-verify candidates against the shots (all shots are
    # class C, so exactly the class-C candidates are confirmed)
    knn_tool.main(
        _parse(
            [
                "--eval-only",
                "QUERY_EXPAND.NN_MODEL", "dino_vits16",
                "QUERY_EXPAND.KNN", "3",
                "QUERY_EXPAND.COSINE_SIM", "True",
                "QUERY_EXPAND.NN_DSET", "('coco_trainval_all_30shot',)",
                "QUERY_EXPAND.GET_CROPS", "True",
                "DATASETS.DT_PATH", f"('{mined_json}',)",
                "DATASETS.TRAIN", "('coco_trainval_all',)",
                "DATALOADER.NUM_WORKERS", "0",
                "OUTPUT_DIR", os.path.join(root, "knn"),
            ]
        )
    )
    verified_json = mined_json.replace(".json", "_dino_vits16_03_cosine.json")
    assert os.path.exists(verified_json)
    verified = json.load(open(verified_json))
    assert verified["annotations"], "verification kept no candidates"
    verified_ids = {a["id"] for a in verified["annotations"]}
    mined_ids = {a["id"] for a in mined["annotations"]}
    assert verified_ids <= mined_ids
    # the shots are all class C -> only class-C candidates can be confirmed
    assert all(a["category_id"] == dom_cls for a in verified["annotations"])

    # ---- stage 16: cascade-correct the verified candidate boxes
    train_net_reg_qe.main(
        _parse(
            [
                "--config-file", ubbr_yaml, "--resume", "--eval-only",
                *_mini_opts(
                    ubbr_dir,
                    [
                        "MODEL.META_ARCHITECTURE", "GeneralizedRCNNRegOnly",
                        "MODEL.ROI_HEADS.NUM_CLASSES", "80",
                        "MODEL.LOAD_PROPOSALS", "False",
                        "QUERY_EXPAND.ENABLED", "True",
                        "DATASETS.DT_PATH", f"('{verified_json}',)",
                    ],
                ),
            ]
        )
    )
    ubbr_json = verified_json.replace(".json", "_ubbr.json")
    assert os.path.exists(ubbr_json)
    # UBBRSaver writes a flat result list (reference
    # coco_evaluation.py:instances_to_coco_json_ubbr), not a COCO dict
    corrected = json.load(open(ubbr_json))
    assert corrected
    for a in corrected:
        assert "bbox_orig" in a and a["id"] in verified_ids

    # ---- stage 17a: corrected boxes by annotation id
    combine_ubbr_with_qe.main(
        combine_ubbr_with_qe.parser.parse_args(
            ["--ubbr-data", ubbr_json, "--qe-data", verified_json]
        )
    )
    id_json = ubbr_json.replace(".json", "_id.json")
    assert os.path.exists(id_json)
    by_id = {a["id"]: a for a in json.load(open(id_json))["annotations"]}
    corrected_by_id = {a["id"]: a for a in corrected}
    assert set(by_id) == verified_ids
    # boxes were replaced by the corrected versions
    for aid, a in corrected_by_id.items():
        assert by_id[aid]["bbox"] == pytest.approx(a["bbox"], abs=1e-4)

    # ---- stage 17b: merge with rejected candidates as ignore regions
    combine_pseudo_with_ignore.main(
        combine_pseudo_with_ignore.parser.parse_args(
            ["--ps-data", id_json, "--ig-data", mined_json]
        )
    )
    ignore_json = id_json.replace(".json", "_ignore.json")
    assert os.path.exists(ignore_json)
    ig = json.load(open(ignore_json))
    # kept = exactly the verified candidates; everything else mined on their
    # images (rejected classes + sub-band dets) became ignore regions
    assert {a["id"] for a in ig["annotations"] if not a.get("ignore_qe")} == verified_ids
    ig_ids = {a["id"] for a in ig["annotations"] if a.get("ignore_qe")}
    assert ig_ids and ig_ids.isdisjoint(verified_ids)

    # ---- stage 17c: add base-class gt annotations for the same images
    combine_qe_with_base.main(
        combine_qe_with_base.parser.parse_args(
            ["--ps-data", ignore_json, "--bs-data", mini_coco["all_json"]]
        )
    )
    wbase_json = ignore_json.replace(".json", "_wbase.json")
    assert os.path.exists(wbase_json)
    wb = json.load(open(wbase_json))
    cats_present = {a["category_id"] for a in wb["annotations"]}
    assert TRUCK in cats_present, "base-class annotations were not merged"
    assert dom_cls in cats_present
    # pseudo-annotation ids stay unique through all merges (detector-score
    # anns). Base gt ids MAY collide with miner-assigned ids — the reference
    # tolerates that: COCO.loadRes numbers detections 1..N and
    # lvc/data/meta_coco.py (unlike vanilla d2 coco.py:122) never asserts
    # uniqueness across the merged file.
    ps_ids = [a["id"] for a in wb["annotations"] if "score" in a]
    assert len(ps_ids) == len(set(ps_ids))
    n_base = sum("score" not in a for a in wb["annotations"])
    assert n_base >= len({a["image_id"] for a in wb["annotations"]})

    # ---- stage 18: retrain on the pseudo-annotations with ignore regions
    train_net_qe_ig.main(
        _parse(
            [
                "--config-file", base_yaml,
                *_mini_opts(
                    retrain_dir,
                    [
                        "QUERY_EXPAND.ENABLED", "True",
                        "DATASETS.DT_PATH", f"('{wbase_json}',)",
                        "MODEL.WEIGHTS", init_pth,
                    ],
                ),
            ]
        )
    )
    assert os.path.exists(os.path.join(retrain_dir, "last_checkpoint"))
    metrics_file = os.path.join(retrain_dir, "metrics.json")
    if os.path.exists(metrics_file):
        last = json.loads(open(metrics_file).read().strip().splitlines()[-1])
        assert np.isfinite(last.get("total_loss", 0.0))
