"""COCOeval speed: ours vs the reference's compiled cocoeval.cpp.

Times both implementations end-to-end on the same canned workload
(2000 images x 100 dets/image x 80 categories — the PERF.md COCOeval
workload), on the same machine, single core:

- ours: `lvc_tpu.evaluation.fast_eval_api.COCOeval_opt` (batched native
  C matcher + vectorized accumulate).
- reference: the reference's own C++ `COCOevalEvaluateImages` +
  `COCOevalAccumulate` (detectron2/layers/csrc/cocoeval/cocoeval.cpp:1-501,
  compiled by tests/reference_harness.py), driven exactly like
  detectron2/evaluation/fast_eval_api.py:16-119 — python _prepare +
  computeIoU + dict->InstanceAnnotation conversion + the C++ calls, so the
  timed spans cover the same work in both.

Both paths share OUR COCOeval's `_prepare`/`computeIoU` (the parity tier
pins their semantics against the reference), so the comparison isolates
the evaluate/accumulate machinery the C++ replaces. Run SOLO on this
1-core box (docs/PERF.md measurement note).

Usage: python scripts/bench_cocoeval.py [--images 2000] [--dets 100]
"""
import argparse
import copy
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_workload(n_imgs=2000, n_dets=100, n_cats=80, seed=0):
    """Canned gt + detections: ~8 gt/image, n_dets detections/image spread
    over categories, areas crossing the S/M/L boundaries, crowds/ignores."""
    from lvc_tpu.data.coco_api import COCO

    rng = np.random.RandomState(seed)
    cat_ids = list(range(1, n_cats + 1))
    images, anns, rows = [], [], []
    aid = 1
    for img_id in range(1, n_imgs + 1):
        W, H = int(rng.randint(400, 1024)), int(rng.randint(400, 1024))
        images.append({"id": img_id, "height": H, "width": W})
        gt_boxes = []
        for _ in range(int(rng.randint(2, 15))):
            w = float(np.exp(rng.uniform(np.log(6), np.log(300))))
            h = float(np.exp(rng.uniform(np.log(6), np.log(300))))
            x0 = float(rng.uniform(0, max(W - w, 1)))
            y0 = float(rng.uniform(0, max(H - h, 1)))
            cat = int(rng.choice(cat_ids))
            anns.append({
                "id": aid, "image_id": img_id, "category_id": cat,
                "bbox": [x0, y0, w, h], "area": w * h,
                "iscrowd": int(rng.rand() < 0.05),
            })
            gt_boxes.append((x0, y0, w, h, cat))
            aid += 1
        # detections: half jittered copies of gt (high score), half noise
        for k in range(n_dets):
            if gt_boxes and k < n_dets // 2:
                x0, y0, w, h, cat = gt_boxes[k % len(gt_boxes)]
                jx, jy = rng.uniform(-0.15, 0.15, 2) * np.array([w, h])
                bbox = [x0 + float(jx), y0 + float(jy),
                        w * rng.uniform(0.8, 1.25), h * rng.uniform(0.8, 1.25)]
                score = float(rng.uniform(0.5, 1.0))
            else:
                w = float(np.exp(rng.uniform(np.log(6), np.log(300))))
                h = float(np.exp(rng.uniform(np.log(6), np.log(300))))
                bbox = [float(rng.uniform(0, max(W - w, 1))),
                        float(rng.uniform(0, max(H - h, 1))), w, h]
                cat = int(rng.choice(cat_ids))
                score = float(rng.uniform(0.01, 0.6))
            rows.append({"image_id": img_id, "category_id": cat,
                         "bbox": bbox, "score": score})
    gt = COCO({
        "images": images,
        "categories": [{"id": c, "name": f"c{c}"} for c in cat_ids],
        "annotations": anns,
    })
    return gt, rows


def bench_ours(gt, rows):
    from lvc_tpu.evaluation.fast_eval_api import COCOeval_opt

    dt = gt.loadRes(copy.deepcopy(rows))
    ev = COCOeval_opt(gt, dt, "bbox")
    t0 = time.perf_counter()
    ev.evaluate()
    t_eval = time.perf_counter() - t0
    t0 = time.perf_counter()
    ev.accumulate()
    t_acc = time.perf_counter() - t0
    ev.summarize()
    return t_eval, t_acc, ev.stats.copy()


def bench_reference(gt, rows):
    """The reference COCOeval_opt flow (fast_eval_api.py:16-119) against
    its own compiled C++, timed span-for-span."""
    from tests.reference_harness import compiled_reference_cocoeval
    from lvc_tpu.evaluation.coco_eval import COCOeval

    ext = compiled_reference_cocoeval()
    dt = gt.loadRes(copy.deepcopy(rows))
    ev = COCOeval(gt, dt, "bbox")

    # ---- evaluate() span (mirrors fast_eval_api.py:24-94) ----
    t0 = time.perf_counter()
    p = ev.params
    p.imgIds = list(np.unique(p.imgIds))
    p.catIds = list(np.unique(p.catIds))
    p.maxDets = sorted(p.maxDets)
    ev._prepare()
    ev.ious = {
        (i, c): np.asarray(ev.computeIoU(i, c), np.float64)
        for i in p.imgIds for c in p.catIds
    }

    def conv(instances, is_det):
        return [
            ext.InstanceAnnotation(
                int(x["id"]),
                float(x["score"]) if is_det else float(x.get("score", 0.0)),
                float(x["area"]),
                bool(x.get("iscrowd", 0)),
                bool(x.get("ignore", 0)),
            )
            for x in instances
        ]

    gts = [[conv(ev._gts[i, c], False) for c in p.catIds] for i in p.imgIds]
    dts = [[conv(ev._dts[i, c], True) for c in p.catIds] for i in p.imgIds]
    ious = [[ev.ious[i, c] for c in p.catIds] for i in p.imgIds]
    evalimgs = ext.COCOevalEvaluateImages(
        [list(map(float, a)) for a in p.areaRng],
        int(p.maxDets[-1]),
        [float(t) for t in p.iouThrs],
        ious, gts, dts,
    )
    t_eval = time.perf_counter() - t0

    # ---- accumulate() span (mirrors fast_eval_api.py:97-119) ----
    t0 = time.perf_counter()
    out = ext.COCOevalAccumulate(p, evalimgs)
    counts = list(out["counts"])
    precision = np.array(out["precision"]).reshape(counts)
    recall = np.array(out["recall"]).reshape(counts[:1] + counts[2:])
    scores = np.array(out["scores"]).reshape(counts)
    t_acc = time.perf_counter() - t0

    ev.eval = {"params": p, "counts": counts, "precision": precision,
               "recall": recall, "scores": scores}
    ev.summarize()
    return t_eval, t_acc, ev.stats.copy()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2000)
    ap.add_argument("--dets", type=int, default=100)
    ap.add_argument("--cats", type=int, default=80)
    ap.add_argument("--skip-reference", action="store_true")
    args = ap.parse_args()

    print(f"workload: {args.images} images x {args.dets} dets x {args.cats} cats")
    t0 = time.perf_counter()
    gt, rows = make_workload(args.images, args.dets, args.cats)
    print(f"workload built in {time.perf_counter() - t0:.1f} s "
          f"({len(rows)} detections)")

    ours_eval, ours_acc, ours_stats = bench_ours(gt, rows)
    print(f"ours      : evaluate {ours_eval:6.2f} s   accumulate {ours_acc:5.2f} s")

    if not args.skip_reference:
        ref_eval, ref_acc, ref_stats = bench_reference(gt, rows)
        print(f"reference : evaluate {ref_eval:6.2f} s   accumulate {ref_acc:5.2f} s")
        print(f"speedup   : evaluate {ref_eval / ours_eval:6.2f} x  "
              f"accumulate {ref_acc / ours_acc:5.2f} x")
        agree = np.allclose(ours_stats, ref_stats, atol=1e-12)
        print(f"stats agree (1e-12): {agree}")
        print("ours stats:", np.round(ours_stats, 6).tolist())
        print("ref  stats:", np.round(ref_stats, 6).tolist())
        if not agree:
            sys.exit(1)


if __name__ == "__main__":
    main()
