"""Rotated boxes: IoU vs a scalar Sutherland-Hodgman reference, NMS parity."""
import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import numpy as np
import jax.numpy as jnp
import pytest

from lvc_tpu.structures import boxes as box_ops
from lvc_tpu.structures import rotated_boxes as rb
from lvc_tpu.ops.nms import nms_mask, nms_rotated_mask, batched_nms_rotated_mask


def _corners_np(box):
    cx, cy, w, h, a = box
    t = np.deg2rad(a)
    c, s = np.cos(t), np.sin(t)
    pts = []
    for dx, dy in [(-w / 2, -h / 2), (w / 2, -h / 2), (w / 2, h / 2), (-w / 2, h / 2)]:
        pts.append([cx + dx * c + dy * s, cy - dx * s + dy * c])
    return np.array(pts)


def _cross2(a, b):
    return a[0] * b[1] - a[1] * b[0]


def _clip_polygon(poly, edge_p0, edge_p1):
    """Sutherland-Hodgman: clip polygon by the half-plane left of p0->p1."""
    out = []
    n = len(poly)
    for i in range(n):
        cur, nxt = poly[i], poly[(i + 1) % n]
        d = edge_p1 - edge_p0
        cur_in = _cross2(d, cur - edge_p0) >= 0
        nxt_in = _cross2(d, nxt - edge_p0) >= 0
        if cur_in:
            out.append(cur)
        if cur_in != nxt_in:
            e = nxt - cur
            denom = _cross2(d, e)
            if abs(denom) > 1e-12:
                t = _cross2(d, edge_p0 - cur) / denom
                out.append(cur + t * e)
    return out


def _poly_area(poly):
    if len(poly) < 3:
        return 0.0
    p = np.array(poly)
    x, y = p[:, 0], p[:, 1]
    return abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2.0


def _iou_rotated_ref(b1, b2):
    q1, q2 = _corners_np(b1), _corners_np(b2)
    # orient q2 CCW for the half-plane test
    if _signed_area(q2) < 0:
        q2 = q2[::-1]
    poly = list(q1)
    for i in range(4):
        poly = _clip_polygon(poly, q2[i], q2[(i + 1) % 4])
        if not poly:
            break
    inter = _poly_area(poly)
    a1, a2 = b1[2] * b1[3], b2[2] * b2[3]
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def _signed_area(p):
    x, y = p[:, 0], p[:, 1]
    return (np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2.0


def test_pairwise_iou_rotated_vs_polygon_clip():
    rng = np.random.RandomState(0)
    n, m = 12, 10
    b1 = np.stack(
        [
            rng.uniform(20, 80, n),
            rng.uniform(20, 80, n),
            rng.uniform(5, 40, n),
            rng.uniform(5, 40, n),
            rng.uniform(-180, 180, n),
        ],
        axis=1,
    ).astype(np.float32)
    b2 = np.stack(
        [
            rng.uniform(20, 80, m),
            rng.uniform(20, 80, m),
            rng.uniform(5, 40, m),
            rng.uniform(5, 40, m),
            rng.uniform(-180, 180, m),
        ],
        axis=1,
    ).astype(np.float32)
    got = np.asarray(rb.pairwise_iou_rotated(jnp.asarray(b1), jnp.asarray(b2)))
    want = np.array([[_iou_rotated_ref(a, b) for b in b2] for a in b1])
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_iou_rotated_axis_aligned_matches_xyxy():
    rng = np.random.RandomState(1)
    n = 16
    xywha = np.stack(
        [
            rng.uniform(30, 70, n),
            rng.uniform(30, 70, n),
            rng.uniform(5, 30, n),
            rng.uniform(5, 30, n),
            np.zeros(n),
        ],
        axis=1,
    ).astype(np.float32)
    xyxy = np.stack(
        [
            xywha[:, 0] - xywha[:, 2] / 2,
            xywha[:, 1] - xywha[:, 3] / 2,
            xywha[:, 0] + xywha[:, 2] / 2,
            xywha[:, 1] + xywha[:, 3] / 2,
        ],
        axis=1,
    )
    got = np.asarray(rb.pairwise_iou_rotated(jnp.asarray(xywha), jnp.asarray(xywha)))
    want = np.asarray(box_ops.pairwise_iou(jnp.asarray(xyxy), jnp.asarray(xyxy)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_iou_rotated_identity_and_disjoint():
    b = jnp.asarray([[50.0, 50.0, 20.0, 10.0, 33.0]])
    far = jnp.asarray([[500.0, 500.0, 20.0, 10.0, -7.0]])
    assert np.asarray(rb.pairwise_iou_rotated(b, b))[0, 0] == pytest.approx(1.0, abs=1e-5)
    assert np.asarray(rb.pairwise_iou_rotated(b, far))[0, 0] == 0.0


def test_nms_rotated_matches_axis_aligned_at_zero_angle():
    rng = np.random.RandomState(2)
    n = 64
    x0 = rng.uniform(0, 200, n)
    y0 = rng.uniform(0, 200, n)
    w = rng.uniform(10, 60, n)
    h = rng.uniform(10, 60, n)
    xyxy = np.stack([x0, y0, x0 + w, y0 + h], axis=1).astype(np.float32)
    xywha = np.stack([x0 + w / 2, y0 + h / 2, w, h, np.zeros(n)], axis=1).astype(
        np.float32
    )
    scores = rng.rand(n).astype(np.float32)
    valid = np.ones(n, bool)
    keep_aa = np.asarray(nms_mask(jnp.asarray(xyxy), jnp.asarray(scores), jnp.asarray(valid), 0.5))
    keep_rot = np.asarray(
        nms_rotated_mask(jnp.asarray(xywha), jnp.asarray(scores), jnp.asarray(valid), 0.5)
    )
    np.testing.assert_array_equal(keep_aa, keep_rot)


def test_batched_nms_rotated_classes_isolated():
    # identical overlapping boxes in different classes must all survive
    boxes = jnp.asarray([[50.0, 50, 20, 10, 15]] * 4)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    idxs = jnp.asarray([0, 1, 2, 3])
    valid = jnp.ones(4, bool)
    keep = np.asarray(batched_nms_rotated_mask(boxes, scores, idxs, valid, 0.5))
    assert keep.all()
    # same class: only the best survives
    keep2 = np.asarray(
        batched_nms_rotated_mask(boxes, scores, jnp.zeros(4, jnp.int32), valid, 0.5)
    )
    assert keep2.tolist() == [True, False, False, False]


def test_normalize_clip_nonempty():
    b = jnp.asarray([[50.0, 50, 20, 10, 365.0], [50.0, 50, 0.0, 10, 0.0]])
    nb = rb.normalize_angles(b)
    assert np.asarray(nb)[0, 4] == pytest.approx(5.0)
    ne = rb.nonempty_rotated(b)
    assert np.asarray(ne).tolist() == [True, False]
    clipped = rb.clip_rotated(jnp.asarray([[5.0, 5.0, 20.0, 20.0, 0.0]]), 100, 100)
    c = np.asarray(clipped)[0]
    assert c[0] == pytest.approx(7.5) and c[2] == pytest.approx(15.0)


def test_roi_align_rotated_zero_angle_matches_axis_aligned():
    from lvc_tpu.ops.roi_align import multilevel_roi_align, roi_align_rotated

    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.rand(32, 48, 8).astype(np.float32))
    n = 6
    cx = rng.uniform(20, 150, n)
    cy = rng.uniform(20, 100, n)
    w = rng.uniform(8, 60, n)
    h = rng.uniform(8, 60, n)
    rois = jnp.asarray(np.stack([cx, cy, w, h, np.zeros(n)], 1).astype(np.float32))
    xyxy = jnp.asarray(
        np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1).astype(np.float32)
    )
    got = roi_align_rotated(feat, rois, spatial_scale=0.25, output_size=7, max_grid=16)
    want = multilevel_roi_align(
        [feat], xyxy, strides=(4,), output_size=7, max_grid=16
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_roi_align_rotated_90deg_equivariance():
    from lvc_tpu.ops.roi_align import roi_align_rotated

    rng = np.random.RandomState(4)
    H, W = 40, 56
    feat = rng.rand(H, W, 4).astype(np.float32)
    n = 5
    rois = np.stack(
        [
            rng.uniform(15, W - 15, n),
            rng.uniform(15, H - 15, n),
            rng.uniform(6, 20, n),
            rng.uniform(6, 20, n),
            rng.uniform(-180, 180, n),
        ],
        axis=1,
    ).astype(np.float32)
    out = roi_align_rotated(jnp.asarray(feat), jnp.asarray(rois), 1.0, 5, max_grid=8)
    # rotate the plane 90 deg CCW in index space: F'[W-1-x, y] = F[y, x].
    # In IMAGE coords (pixel j covers [j, j+1)) that is (x, y) -> (y, W - x).
    feat_r = np.rot90(feat, k=1, axes=(0, 1)).copy()
    rois_r = rois.copy()
    rois_r[:, 0] = rois[:, 1]
    rois_r[:, 1] = W - rois[:, 0]
    rois_r[:, 4] = rois[:, 4] + 90.0
    out_r = roi_align_rotated(jnp.asarray(feat_r), jnp.asarray(rois_r), 1.0, 5, max_grid=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_r), atol=1e-5)


def test_rroi_heads_smoke():
    import jax
    from lvc_tpu.modeling.roi_heads.rotated_fast_rcnn import RROIHeads

    rng = np.random.RandomState(5)
    B, P, G = 2, 16, 4
    feats = {
        "p2": jnp.asarray(rng.rand(B, 32, 32, 16).astype(np.float32)),
        "p3": jnp.asarray(rng.rand(B, 16, 16, 16).astype(np.float32)),
    }
    heads = RROIHeads(
        in_features=("p2", "p3"),
        strides={"p2": 4, "p3": 8},
        num_classes=5,
        batch_size_per_image=8,
        num_fc=1,
        fc_dim=32,
    )
    proposals = jnp.asarray(
        np.stack(
            [
                rng.uniform(20, 100, (B, P)),
                rng.uniform(20, 100, (B, P)),
                rng.uniform(8, 30, (B, P)),
                rng.uniform(8, 30, (B, P)),
                rng.uniform(-90, 90, (B, P)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    pvalid = jnp.ones((B, P), bool)
    gt = {
        "boxes": jnp.asarray(
            np.stack(
                [
                    rng.uniform(20, 100, (B, G)),
                    rng.uniform(20, 100, (B, G)),
                    rng.uniform(8, 30, (B, G)),
                    rng.uniform(8, 30, (B, G)),
                    rng.uniform(-90, 90, (B, G)),
                ],
                axis=-1,
            ).astype(np.float32)
        ),
        "classes": jnp.asarray(rng.randint(0, 5, (B, G)).astype(np.int32)),
        "valid": jnp.ones((B, G), bool),
    }
    sizes = jnp.asarray(np.full((B, 2), 128, np.int32))
    variables = heads.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        feats, proposals, pvalid, sizes, gt, train=True,
    )
    losses = heads.apply(
        variables, feats, proposals, pvalid, sizes, gt, train=True,
        rngs={"sampling": jax.random.PRNGKey(2)},
    )
    assert np.isfinite(float(losses["loss_cls"]))
    assert np.isfinite(float(losses["loss_box_reg"]))

    dets = heads.apply(variables, feats, proposals, pvalid, sizes, train=False)
    # detection slots are capped by the candidate count min(topk, P*K)
    slots = min(100, P * 5)
    assert dets.boxes.shape == (B, slots, 5)
    assert dets.valid.shape == (B, slots)


def test_rotated_cocoeval_perfect_ap1():
    from lvc_tpu.data.coco_api import COCO
    from lvc_tpu.evaluation.rotated_coco_evaluation import RotatedCOCOeval

    gt = COCO(
        {
            "images": [{"id": 0, "height": 100, "width": 100}],
            "categories": [{"id": 1, "name": "c1"}],
            "annotations": [
                {
                    "id": 1,
                    "image_id": 0,
                    "category_id": 1,
                    "bbox": [50, 50, 20, 10, 30],  # XYWHA
                    "area": 200,
                    "iscrowd": 0,
                }
            ],
        }
    )
    dets = [
        {"image_id": 0, "category_id": 1, "bbox": [50, 50, 20, 10, 30], "score": 0.9},
        # same box at a very different angle: low IoU, becomes an FP at 0.5
        {"image_id": 0, "category_id": 1, "bbox": [50, 50, 20, 10, -60], "score": 0.3},
    ]
    dt = gt.loadRes(dets)
    E = RotatedCOCOeval(gt, dt)
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    assert np.isclose(stats[1], 1.0)  # AP50: rotated match found


def test_rotated_cocoeval_angle_mismatch_is_fp():
    from lvc_tpu.data.coco_api import COCO
    from lvc_tpu.evaluation.rotated_coco_evaluation import RotatedCOCOeval

    gt = COCO(
        {
            "images": [{"id": 0, "height": 100, "width": 100}],
            "categories": [{"id": 1, "name": "c1"}],
            "annotations": [
                {
                    "id": 1,
                    "image_id": 0,
                    "category_id": 1,
                    "bbox": [50, 50, 30, 5, 0],
                    "area": 150,
                    "iscrowd": 0,
                }
            ],
        }
    )
    # thin box rotated 90 deg: IoU = (5*5)/(150+150-25) << 0.5
    dets = [{"image_id": 0, "category_id": 1, "bbox": [50, 50, 30, 5, 90], "score": 0.9}]
    dt = gt.loadRes(dets)
    E = RotatedCOCOeval(gt, dt)
    E.evaluate()
    E.accumulate()
    stats = E.summarize()
    assert stats[1] == 0.0  # AP50 = 0
