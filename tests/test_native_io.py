"""Native C++ image IO core vs the PIL reference path."""
import os

import numpy as np
import pytest
from PIL import Image

from lvc_tpu.data import native_io


pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native imageio not built"
)


@pytest.fixture()
def img(tmp_path):
    rng = np.random.RandomState(0)
    arr = (np.cumsum(np.cumsum(rng.rand(240, 320, 3), 0), 1) % 256).astype(np.uint8)
    jpath = os.path.join(tmp_path, "t.jpg")
    ppath = os.path.join(tmp_path, "t.png")
    Image.fromarray(arr).save(jpath, quality=92)
    Image.fromarray(arr).save(ppath)
    return arr, jpath, ppath


def test_png_decode_bit_exact(img):
    arr, _, ppath = img
    got, (oh, ow) = native_io.load_resize(ppath, 0)
    assert (oh, ow) == arr.shape[:2]
    np.testing.assert_array_equal(got, arr)


def test_jpeg_decode_matches_pil(img):
    _, jpath, _ = img
    pil = np.asarray(Image.open(jpath).convert("RGB"))
    got, _ = native_io.load_resize(jpath, 0)
    # both decode through libjpeg — identical output
    np.testing.assert_array_equal(got, pil)


@pytest.mark.parametrize("dh,dw", [(120, 160), (97, 129), (480, 640)])
def test_resize_matches_pil_bilinear(img, dh, dw):
    arr = img[0]
    ours = native_io.resize(arr, dh, dw)
    pil = np.asarray(Image.fromarray(arr).resize((dw, dh), Image.BILINEAR))
    assert np.abs(ours.astype(int) - pil.astype(int)).max() <= 1


def test_load_resize_shortest_edge(img):
    _, _, ppath = img
    got, (oh, ow) = native_io.load_resize(ppath, 128, 1333)
    assert min(got.shape[:2]) == 128
    assert (oh, ow) == (240, 320)
    # d2 sizing rule: scale both sides by short/min, round +0.5
    assert got.shape[:2] == (128, int(320 * 128 / 240 + 0.5))


def test_mapper_read_image_native_matches_pil(img):
    from lvc_tpu.data.dataset_mapper import read_image

    arr, jpath, _ = img
    got = read_image(jpath, fmt="RGB")
    pil = np.asarray(Image.open(jpath).convert("RGB"))
    np.testing.assert_array_equal(got, pil)
    got_bgr = read_image(jpath, fmt="BGR")
    np.testing.assert_array_equal(got_bgr, pil[:, :, ::-1])
