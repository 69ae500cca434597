"""Native COCOeval must match the pure-python implementation exactly."""
import numpy as np
import pytest

from lvc_tpu.data.coco_api import COCO
from lvc_tpu.evaluation.coco_eval import COCOeval
from lvc_tpu.evaluation.fast_eval_api import COCOeval_opt, _load_lib


def random_dataset(seed, n_imgs=6, n_cats=3, crowd_prob=0.15):
    rng = np.random.RandomState(seed)
    images = [{"id": i, "height": 200, "width": 200} for i in range(n_imgs)]
    anns = []
    aid = 1
    for i in range(n_imgs):
        for _ in range(rng.randint(0, 6)):
            w, h = rng.randint(5, 80, 2)
            x, y = rng.randint(0, 120, 2)
            anns.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": int(rng.randint(1, n_cats + 1)),
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "area": float(w * h),
                    "iscrowd": int(rng.rand() < crowd_prob),
                }
            )
            aid += 1
    gt = COCO(
        {
            "images": images,
            "categories": [{"id": c, "name": f"c{c}"} for c in range(1, n_cats + 1)],
            "annotations": anns,
        }
    )
    dets = []
    for i in range(n_imgs):
        for _ in range(rng.randint(0, 10)):
            w, h = rng.randint(5, 80, 2)
            x, y = rng.randint(0, 120, 2)
            dets.append(
                {
                    "image_id": i,
                    "category_id": int(rng.randint(1, n_cats + 1)),
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "score": float(rng.rand()),
                }
            )
    # some dets near gt so there are true positives
    for a in anns[::2]:
        bx = list(a["bbox"])
        bx[0] += rng.randn() * 2
        bx[1] += rng.randn() * 2
        dets.append(
            {
                "image_id": a["image_id"],
                "category_id": a["category_id"],
                "bbox": [float(v) for v in bx],
                "score": float(rng.rand() * 0.5 + 0.5),
            }
        )
    return gt, dets


@pytest.mark.skipif(_load_lib() is None, reason="native cocoeval unavailable")
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_python(seed):
    gt, dets = random_dataset(seed)
    dt = gt.loadRes([dict(d) for d in dets])

    e_py = COCOeval(gt, dt)
    e_py.evaluate()
    e_py.accumulate()
    stats_py = e_py.summarize()

    dt2 = gt.loadRes([dict(d) for d in dets])
    e_c = COCOeval_opt(gt, dt2)
    e_c.evaluate()
    e_c.accumulate()
    stats_c = e_c.summarize()

    np.testing.assert_allclose(stats_c, stats_py, atol=1e-12, err_msg=str(seed))
    np.testing.assert_allclose(
        e_c.eval["precision"], e_py.eval["precision"], atol=1e-12
    )
    np.testing.assert_allclose(e_c.eval["recall"], e_py.eval["recall"], atol=1e-12)
