import numpy as np
import jax.numpy as jnp

from lvc_tpu.ops.nms import nms_mask, batched_nms_mask, masked_topk


def greedy_nms_reference(boxes, scores, iou_threshold):
    """O(n^2) python greedy NMS, torchvision semantics (iou > thr suppresses)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for pos, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        bi = boxes[i]
        for j in order[pos + 1 :]:
            if suppressed[j]:
                continue
            bj = boxes[j]
            ix0, iy0 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix1, iy1 = min(bi[2], bj[2]), min(bi[3], bj[3])
            inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
            ua = (
                (bi[2] - bi[0]) * (bi[3] - bi[1])
                + (bj[2] - bj[0]) * (bj[3] - bj[1])
                - inter
            )
            iou = inter / ua if ua > 0 else 0.0
            if iou > iou_threshold:
                suppressed[j] = True
    return sorted(keep)


def _rand(n, seed, spread=80.0):
    rng = np.random.RandomState(seed)
    b = rng.rand(n, 4).astype(np.float32) * spread
    b[:, 2:] = b[:, :2] + rng.rand(n, 2).astype(np.float32) * 40 + 1
    s = rng.rand(n).astype(np.float32)
    return b, s


def test_nms_matches_reference_small():
    b, s = _rand(37, 0)
    keep_ref = greedy_nms_reference(b, s, 0.5)
    got = np.asarray(nms_mask(jnp.asarray(b), jnp.asarray(s), jnp.ones(37, bool), 0.5))
    assert sorted(np.nonzero(got)[0].tolist()) == keep_ref


def test_nms_matches_reference_multi_tile():
    # > 128 boxes forces cross-tile suppression paths
    b, s = _rand(400, 1, spread=60.0)
    for thr in (0.3, 0.5, 0.7):
        keep_ref = greedy_nms_reference(b, s, thr)
        got = np.asarray(nms_mask(jnp.asarray(b), jnp.asarray(s), jnp.ones(400, bool), thr))
        assert sorted(np.nonzero(got)[0].tolist()) == keep_ref, thr


def test_nms_suppression_chain():
    # a suppresses b, so b must NOT suppress c; exercises the fixpoint.
    boxes = np.array(
        [
            [0.0, 0.0, 10.0, 10.0],
            [3.0, 0.0, 13.0, 10.0],  # iou(a,b) ~ 0.54 -> suppressed by a
            [6.5, 0.0, 16.5, 10.0],  # iou(b,c) ~ 0.52, iou(a,c) ~ 0.2 -> kept
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(3, bool), 0.5))
    assert keep.tolist() == [True, False, True]


def test_nms_respects_validity():
    b, s = _rand(50, 3)
    valid = np.zeros(50, bool)
    valid[:20] = True
    keep_ref = greedy_nms_reference(b[:20], s[:20], 0.5)
    got = np.asarray(nms_mask(jnp.asarray(b), jnp.asarray(s), jnp.asarray(valid), 0.5))
    assert not got[20:].any()
    assert sorted(np.nonzero(got[:20])[0].tolist()) == keep_ref


def test_batched_nms_classes_dont_interact():
    boxes = np.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    same = np.asarray(
        batched_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.zeros(2, jnp.int32), jnp.ones(2, bool), 0.5
        )
    )
    diff = np.asarray(
        batched_nms_mask(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.arange(2, dtype=jnp.int32), jnp.ones(2, bool), 0.5
        )
    )
    assert same.tolist() == [True, False]
    assert diff.tolist() == [True, True]


def test_masked_topk():
    s = jnp.asarray(np.array([0.1, 0.9, 0.5, 0.7], np.float32))
    v = jnp.asarray(np.array([True, False, True, True]))
    idx, valid = masked_topk(s, v, 3)
    assert np.asarray(idx).tolist() == [3, 2, 0]
    assert np.asarray(valid).all()
    idx2, valid2 = masked_topk(s, jnp.asarray([True, False, False, False]), 3)
    assert np.asarray(idx2)[0] == 0
    assert np.asarray(valid2).tolist() == [True, False, False]


def test_fixpoint_matches_tiled_on_clustered_boxes():
    """The global-fixpoint path (N <= 4096) must agree with the tiled
    sequential implementation on dense clusters with long suppression
    chains — both are exact greedy NMS."""
    from lvc_tpu.ops.nms import _nms_mask_fixpoint, _nms_mask_impl
    from lvc_tpu.structures import boxes as box_ops

    rng = np.random.RandomState(7)
    for trial in range(4):
        n = 600
        # chain-heavy geometry: boxes slide along a line so each overlaps
        # its neighbours (suppression chains), plus random clutter
        base = np.stack(
            [
                np.linspace(0, 300, n // 2),
                np.zeros(n // 2),
                np.linspace(0, 300, n // 2) + 20,
                np.full(n // 2, 20.0),
            ],
            axis=1,
        )
        clutter = rng.uniform(0, 200, (n // 2, 2))
        clutter = np.concatenate([clutter, clutter + rng.uniform(5, 40, (n // 2, 2))], 1)
        boxes = np.concatenate([base, clutter]).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        # duplicate scores to exercise stable tie-breaking
        scores[rng.choice(n, 50, replace=False)] = 0.5
        valid = rng.rand(n) > 0.1
        for thr in (0.3, 0.5, 0.7):
            fx = np.asarray(
                _nms_mask_fixpoint(
                    jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thr, box_ops.pairwise_iou
                )
            )
            td = np.asarray(
                _nms_mask_impl(
                    jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), thr, 128, box_ops.pairwise_iou
                )
            )
            assert (fx == td).all(), (trial, thr, np.nonzero(fx != td))
