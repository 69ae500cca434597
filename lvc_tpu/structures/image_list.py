"""Batched image padding — reference ``ImageList.from_tensors``
(detectron2/structures/image_list.py:8).

TPU-first twist: rather than padding to the per-batch max (dynamic shapes =
recompilation per batch), the data pipeline buckets images into a small set
of static canvas sizes; this module provides the padding math for both host
(numpy) and device (jnp) tensors in NHWC layout.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple, Union

import numpy as np
import jax.numpy as jnp

Array = Union[np.ndarray, jnp.ndarray]


def pad_to_divisibility(size: Tuple[int, int], divisibility: int) -> Tuple[int, int]:
    h, w = size
    d = divisibility
    return (-(-h // d) * d, -(-w // d) * d)


@dataclasses.dataclass
class ImageList:
    """tensor: (B, H, W, C) padded batch; image_sizes: true (h, w) per image."""

    tensor: Array
    image_sizes: np.ndarray  # (B, 2) int — actual sizes before padding

    def __len__(self):
        return self.tensor.shape[0]

    @staticmethod
    def from_tensors(
        tensors: Sequence[np.ndarray],
        size_divisibility: int = 0,
        pad_value: float = 0.0,
        canvas: Tuple[int, int] | None = None,
    ) -> "ImageList":
        """Pad a list of (h, w, C) images to a common canvas (max size rounded
        up to divisibility, or an explicit static ``canvas``)."""
        sizes = np.array([t.shape[:2] for t in tensors], dtype=np.int32)
        if canvas is None:
            max_h, max_w = sizes.max(axis=0)
        else:
            max_h, max_w = canvas
        if size_divisibility > 0:
            max_h, max_w = pad_to_divisibility((max_h, max_w), size_divisibility)
        batch = np.full(
            (len(tensors), max_h, max_w, tensors[0].shape[2]),
            pad_value,
            dtype=tensors[0].dtype,
        )
        for i, t in enumerate(tensors):
            batch[i, : t.shape[0], : t.shape[1]] = t
        return ImageList(batch, sizes)
