import numpy as np
import jax.numpy as jnp

from lvc_tpu.structures import (
    BoxMode,
    area,
    clip,
    nonempty,
    pairwise_iou,
    pairwise_ioa,
    matched_pairwise_iou,
    pairwise_giou,
    ImageList,
)


def test_boxmode_roundtrip():
    b = np.array([[10.0, 20.0, 30.0, 50.0]])
    xywh = BoxMode.convert(b, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    np.testing.assert_allclose(xywh, [[10, 20, 20, 30]])
    back = BoxMode.convert(xywh, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(back, b)


def test_area_clip_nonempty():
    b = np.array([[0.0, 0.0, 10.0, 5.0], [-5.0, -5.0, 100.0, 100.0], [3.0, 3.0, 3.0, 8.0]])
    np.testing.assert_allclose(area(b), [50.0, 105.0 * 105.0, 0.0])
    c = clip(b, 50, 60)
    np.testing.assert_allclose(c[1], [0, 0, 60, 50])
    np.testing.assert_array_equal(nonempty(b), [True, True, False])


def _iou_naive(a, b):
    out = np.zeros((len(a), len(b)))
    for i, bi in enumerate(a):
        for j, bj in enumerate(b):
            ix0, iy0 = max(bi[0], bj[0]), max(bi[1], bj[1])
            ix1, iy1 = min(bi[2], bj[2]), min(bi[3], bj[3])
            iw, ih = max(ix1 - ix0, 0), max(iy1 - iy0, 0)
            inter = iw * ih
            ua = (bi[2] - bi[0]) * (bi[3] - bi[1]) + (bj[2] - bj[0]) * (bj[3] - bj[1]) - inter
            out[i, j] = inter / ua if inter > 0 else 0.0
    return out


def test_pairwise_iou_matches_naive():
    rng = np.random.RandomState(0)
    a = rng.rand(13, 4) * 100
    a[:, 2:] += a[:, :2]
    b = rng.rand(7, 4) * 100
    b[:, 2:] += b[:, :2]
    got = np.asarray(pairwise_iou(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    np.testing.assert_allclose(got, _iou_naive(a, b), rtol=1e-5, atol=1e-6)


def test_pairwise_iou_degenerate_is_zero():
    a = np.array([[0.0, 0.0, 0.0, 0.0]])
    b = np.array([[0.0, 0.0, 10.0, 10.0]])
    assert pairwise_iou(a, b)[0, 0] == 0.0
    assert pairwise_iou(a, a)[0, 0] == 0.0  # union 0 must not produce nan


def test_pairwise_ioa():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    b = np.array([[5.0, 5.0, 15.0, 15.0]])
    np.testing.assert_allclose(pairwise_ioa(a, b), [[25.0 / 100.0]])


def test_matched_iou_and_giou():
    a = np.array([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 4.0, 4.0]])
    b = np.array([[0.0, 0.0, 10.0, 10.0], [6.0, 6.0, 10.0, 10.0]])
    np.testing.assert_allclose(matched_pairwise_iou(a, b), [1.0, 0.0])
    g = pairwise_giou(a, b)
    assert g[0] == 1.0
    # disjoint boxes: giou = -(enclosing - union)/enclosing = -(100-32)/100
    np.testing.assert_allclose(g[1], -(100.0 - 32.0) / 100.0, rtol=1e-6)


def test_image_list_padding():
    imgs = [np.ones((30, 40, 3), np.float32), np.ones((50, 20, 3), np.float32)]
    il = ImageList.from_tensors(imgs, size_divisibility=32)
    assert il.tensor.shape == (2, 64, 64, 3)
    np.testing.assert_array_equal(il.image_sizes, [[30, 40], [50, 20]])
    # padding region is zero
    assert il.tensor[0, 30:, :, :].sum() == 0
    assert il.tensor[0, :30, :40].sum() == 30 * 40 * 3
