import numpy as np
import jax.numpy as jnp

from lvc_tpu.modeling.matcher import Matcher
from lvc_tpu.structures import pairwise_iou


def test_threshold_bands():
    # RPN-style matcher: thresholds [0.3, 0.7], labels [0, -1, 1]
    m = Matcher([0.3, 0.7], [0, -1, 1])
    quality = jnp.asarray(
        np.array(
            [
                [0.1, 0.4, 0.8, 0.3, 0.7],
            ],
            np.float32,
        )
    )
    matches, labels = m(quality, jnp.asarray([True]))
    assert np.asarray(matches).tolist() == [0] * 5
    # 0.1 -> 0 (neg); 0.4 -> -1 (ignore); 0.8 -> 1 (pos); 0.3 -> -1; 0.7 -> 1
    assert np.asarray(labels).tolist() == [0, -1, 1, -1, 1]


def test_argmax_over_gt():
    m = Matcher([0.5], [0, 1])
    quality = jnp.asarray(np.array([[0.2, 0.9], [0.6, 0.3]], np.float32))
    matches, labels = m(quality, jnp.asarray([True, True]))
    assert np.asarray(matches).tolist() == [1, 0]
    assert np.asarray(labels).tolist() == [1, 1]


def test_invalid_gt_rows_ignored():
    m = Matcher([0.5], [0, 1])
    quality = jnp.asarray(np.array([[0.9, 0.9], [0.6, 0.3]], np.float32))
    matches, labels = m(quality, jnp.asarray([False, True]))
    assert np.asarray(matches).tolist() == [1, 1]
    assert np.asarray(labels).tolist() == [1, 0]


def test_no_valid_gt_labels_all_first_label():
    m = Matcher([0.3, 0.7], [0, -1, 1])
    quality = jnp.asarray(np.zeros((3, 4), np.float32))
    matches, labels = m(quality, jnp.asarray([False, False, False]))
    assert np.asarray(labels).tolist() == [0, 0, 0, 0]


def test_low_quality_matches():
    m = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    # gt 0's best anchor has iou 0.25 (below positive threshold) -> recruited
    quality = jnp.asarray(np.array([[0.25, 0.1], [0.1, 0.8]], np.float32))
    _, labels = m(quality, jnp.asarray([True, True]))
    assert np.asarray(labels).tolist() == [1, 1]
    # without low-quality: anchor 0 would be negative
    m2 = Matcher([0.3, 0.7], [0, -1, 1])
    _, labels2 = m2(quality, jnp.asarray([True, True]))
    assert np.asarray(labels2).tolist() == [0, 1]


def test_low_quality_invalid_gt_does_not_recruit():
    m = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    quality = jnp.asarray(np.array([[0.25, 0.1]], np.float32))
    _, labels = m(quality, jnp.asarray([False]))
    assert np.asarray(labels).tolist() == [0, 0]


def test_with_real_ious():
    anchors = jnp.asarray(
        np.array(
            [[0, 0, 10, 10], [50, 50, 60, 60], [0, 0, 9, 9], [100, 100, 101, 101]],
            np.float32,
        )
    )
    gt = jnp.asarray(np.array([[0, 0, 10, 10], [0, 0, 0, 0]], np.float32))
    iou = pairwise_iou(gt, anchors)
    m = Matcher([0.3, 0.7], [0, -1, 1], allow_low_quality_matches=True)
    matches, labels = m(iou, jnp.asarray([True, False]))
    labels = np.asarray(labels)
    assert labels[0] == 1  # exact match
    assert labels[1] == 0  # no overlap
    assert labels[2] == 1  # iou 81/100 -> positive
    assert labels[3] == 0
