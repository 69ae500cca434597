"""Synthetic convergence-to-AP gate (VERDICT r4 next #2).

The framework's `verify_results` equivalent of the reference's
`TEST.EXPECTED_RESULTS` flow (lvc/evaluation/testing.py:27-57,
lvc/engine/defaults.py:468-469): real COCO data is absent from this
environment, so this trains the production R-50-FPN trainer FROM SCRATCH
on a drawable synthetic detection set (two shape classes on noise
backgrounds) and asserts that the repo's own COCOEvaluator reports high
AP50 on a held-out split — the first end-to-end proof that
trainer + losses + sampling + NMS + evaluator *learn* together.

Runs the full production path: DatasetCatalog registration ->
build_detection_train_loader -> DefaultTrainer (jit'd data-parallel train
step, hooks, EventStorage) -> DefaultTrainer.test -> COCOEvaluator ->
verify_results. Executed once in f32 and once with SOLVER.AMP; both must
pass the same bar. Results are recorded in docs/TESTING.md each round
(`make check-tpu`).

Usage: python scripts/verify_synthetic_ap.py [--iters 600] [--mode both]
       [--ap50-floor 60] [--quick]  (--quick: tiny run, no assertion)
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image, ImageDraw

CLASSES = ["disc", "slab"]  # red-dominant ellipses vs blue-dominant boxes


def _draw_example(rng, size=256):
    """One image: dark noise background + 1-4 bright shapes.

    Shapes are rejection-sampled to keep mutual occlusion low: later
    shapes are drawn ON TOP of earlier ones while the GT keeps the full
    box of the occluded shape, so unconstrained placement caps the
    achievable AP50 around ~54 (measured, round 5) no matter how long
    the trainer runs — the gate would then measure the generator, not
    the learner. With intersection <= 25% of either box the detector's
    ceiling is near-perfect and the assertion bar can be strong.
    """
    arr = (rng.rand(size, size, 3) * 60).astype(np.uint8)
    img = Image.fromarray(arr)
    draw = ImageDraw.Draw(img)
    anns = []
    placed = []
    for _ in range(rng.randint(1, 5)):
        for _attempt in range(25):
            w, h = rng.randint(40, 110, 2)
            x0 = rng.randint(0, size - w)
            y0 = rng.randint(0, size - h)
            ok = True
            for (px, py, pw, ph) in placed:
                ix = max(0, min(x0 + w, px + pw) - max(x0, px))
                iy = max(0, min(y0 + h, py + ph) - max(y0, py))
                inter = ix * iy
                if inter > 0.25 * min(w * h, pw * ph):
                    ok = False
                    break
            if ok:
                break
        else:
            continue  # no low-overlap spot found; draw fewer shapes
        placed.append((x0, y0, w, h))
        cls = rng.randint(2)
        if cls == 0:
            color = (int(rng.randint(170, 256)), int(rng.randint(0, 90)),
                     int(rng.randint(0, 90)))
            draw.ellipse([x0, y0, x0 + w, y0 + h], fill=color)
        else:
            color = (int(rng.randint(0, 90)), int(rng.randint(0, 90)),
                     int(rng.randint(170, 256)))
            draw.rectangle([x0, y0, x0 + w, y0 + h], fill=color)
        anns.append((cls, float(x0), float(y0), float(w), float(h)))
    return img, anns


def build_dataset(root, n_train=220, n_val=60, seed=7):
    """Write a COCO-format shapes dataset to ``root`` (idempotent)."""
    marker = os.path.join(root, "done.json")
    if os.path.exists(marker):
        return json.load(open(marker))
    rng = np.random.RandomState(seed)
    out = {}
    for split, n in (("train", n_train), ("val", n_val)):
        img_dir = os.path.join(root, split)
        os.makedirs(img_dir, exist_ok=True)
        images, annotations = [], []
        aid = 1
        for i in range(n):
            img, anns = _draw_example(rng)
            fname = f"{split}_{i:04d}.png"
            img.save(os.path.join(img_dir, fname))
            img_id = i + 1
            images.append({"id": img_id, "file_name": fname,
                           "height": img.height, "width": img.width})
            for cls, x, y, w, h in anns:
                annotations.append({
                    "id": aid, "image_id": img_id, "category_id": cls + 1,
                    "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                })
                aid += 1
        gt = {
            "images": images,
            "annotations": annotations,
            "categories": [{"id": i + 1, "name": c} for i, c in enumerate(CLASSES)],
        }
        jpath = os.path.join(root, f"instances_{split}.json")
        with open(jpath, "w") as f:
            json.dump(gt, f)
        out[split] = {"json": jpath, "images": img_dir}
    with open(marker, "w") as f:
        json.dump(out, f)
    return out


def register(paths):
    from lvc_tpu.data.catalog import DatasetCatalog, MetadataCatalog
    from lvc_tpu.data.meta_coco import load_coco_json

    meta = {
        "thing_classes": list(CLASSES),
        "thing_dataset_id_to_contiguous_id": {1: 0, 2: 1},
    }
    for split, p in paths.items():
        name = f"synth_shapes_{split}"
        if name in DatasetCatalog:
            continue
        DatasetCatalog.register(
            name,
            lambda jp=p["json"], ir=p["images"], nm=name: load_coco_json(
                jp, ir, meta, nm
            ),
        )
        MetadataCatalog.get(name).set(
            json_file=p["json"], image_root=p["images"],
            evaluator_type="coco", **meta,
        )


def make_cfg(amp: bool, iters: int, out_dir: str):
    from lvc_tpu.config import get_cfg

    cfg = get_cfg()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg.merge_from_file(os.path.join(repo, "configs", "Base-RCNN-FPN.yaml"))
    cfg.DATASETS.TRAIN = ("synth_shapes_train",)
    cfg.DATASETS.TEST = ("synth_shapes_val",)
    cfg.MODEL.RESNETS.DEPTH = 50
    # FrozenBN (the reference default) assumes ImageNet stats; training
    # FROM SCRATCH under frozen unit-stats normalization plateaus at
    # AP50 ~54 regardless of iters or dataset occlusion (measured, round
    # 5). GroupNorm is the standard from-scratch detection norm
    # ("Rethinking ImageNet Pre-training": R50-FPN+GN trains from random
    # init) and is stateless, so the jit'd train step needs no mutable
    # batch_stats plumbing.
    cfg.MODEL.RESNETS.NORM = "GN"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.INPUT.MIN_SIZE_TRAIN = (256,)
    cfg.INPUT.MAX_SIZE_TRAIN = 256
    cfg.INPUT.MIN_SIZE_TEST = 256
    cfg.INPUT.MAX_SIZE_TEST = 256
    cfg.PAD.CANVAS_BUCKETS = [[256, 256]]
    cfg.PAD.MAX_GT_PER_IMAGE = 8
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.SOLVER.IMS_PER_BATCH = 8
    # conditioned-regime from-scratch protocol: damped init (the regime
    # PERF.md's AMP experiments validated), warmup, gradient clipping.
    # Raw he-init at the reference LR diverges in ANY precision
    # (docs/PERF.md "bf16 training status") - the reference never trains
    # cold either, it starts from ImageNet weights.
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_ITERS = 100
    cfg.SOLVER.WARMUP_FACTOR = 1e-3
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    cfg.SOLVER.MAX_ITER = iters
    cfg.SOLVER.STEPS = (int(iters * 0.7), int(iters * 0.9))
    cfg.SOLVER.CHECKPOINT_PERIOD = 10 ** 9
    cfg.SOLVER.AMP.ENABLED = amp
    cfg.TEST.EVAL_PERIOD = 0
    # the reference's golden-metric mechanism, pointed at the synthetic bar
    cfg.TEST.EXPECTED_RESULTS = [["bbox", "AP50", 80.0, 20.0]]
    cfg.OUTPUT_DIR = out_dir
    os.makedirs(out_dir, exist_ok=True)
    return cfg


def run_mode(mode: str, iters: int, data_root: str):
    import jax
    from lvc_tpu.engine.defaults import DefaultTrainer
    from lvc_tpu.evaluation.testing import verify_results

    class GateTrainer(DefaultTrainer):
        """DefaultTrainer in the conditioned-weights regime: damped
        N(0, 0.01) init with 0.65x conv damping — the activation scale of
        real pretrained checkpoints (same protocol as the driver dryrun,
        __graft_entry__.fast_init)."""

        def _materialize(self, shapes, seed):
            import jax.tree_util as jtu
            from lvc_tpu.utils.init import materialize_variables

            v = materialize_variables(shapes, seed, conv_init="damped")
            return jtu.tree_map(lambda a: a * 0.65 if a.ndim == 4 else a, v)

    cfg = make_cfg(mode == "amp", iters, os.path.join(data_root, f"out_{mode}"))
    trainer = GateTrainer(cfg)
    t0 = time.time()
    trainer.train()
    t_train = time.time() - t0
    t0 = time.time()
    results = DefaultTrainer.test(cfg, trainer.state, trainer.eval_step)
    t_eval = time.time() - t0
    ok = verify_results(cfg, results)
    bbox = results["bbox"]
    print(
        f"[{mode}] AP {bbox['AP']:.1f}  AP50 {bbox['AP50']:.1f}  "
        f"AP75 {bbox['AP75']:.1f}  ({iters} iters, train {t_train:.0f}s, "
        f"eval {t_eval:.0f}s, verify_results={'PASS' if ok else 'FAIL'})",
        flush=True,
    )
    return bbox, ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--mode", choices=["f32", "amp", "both"], default="both")
    ap.add_argument("--ap50-floor", type=float, default=60.0)
    ap.add_argument("--quick", action="store_true",
                    help="tiny smoke (20 iters, no assertion)")
    ap.add_argument("--data-root", default="/tmp/lvc_synth_ap")
    args = ap.parse_args()

    import jax

    try:
        cache_dir = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "lvc_tpu", "jax_bench_cache",
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    paths = build_dataset(args.data_root)
    register(paths)
    iters = 20 if args.quick else args.iters

    modes = ["f32", "amp"] if args.mode == "both" else [args.mode]
    failures = []
    for mode in modes:
        bbox, ok = run_mode(mode, iters, args.data_root)
        if not args.quick and (bbox["AP50"] < args.ap50_floor or not ok):
            failures.append(mode)
    if failures:
        print(f"FAIL: AP50 below {args.ap50_floor} (or verify_results "
              f"failed) in: {failures}")
        sys.exit(1)
    if not args.quick:
        print("synthetic convergence-to-AP gate: PASS")


if __name__ == "__main__":
    main()
