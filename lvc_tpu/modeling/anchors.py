"""Anchor generation as precomputed static grids.

Counterpart of the reference ``DefaultAnchorGenerator``
(detectron2/modeling/anchor_generator.py:80-225). Because feature map shapes
are static under jit, anchors are pure functions of (sizes, aspect_ratios,
strides, grid shapes) and fold into constants at trace time.
"""
from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax.numpy as jnp


def generate_cell_anchors(
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """(len(sizes)*len(aspect_ratios), 4) XYXY anchors centered at (0, 0);
    same math as anchor_generator.py:173-208 (area-preserving aspect warp)."""
    anchors = []
    for size in sizes:
        area = size ** 2.0
        for ar in aspect_ratios:
            w = np.sqrt(area / ar)
            h = ar * w
            anchors.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(anchors, dtype=np.float32)


class AnchorGenerator:
    """Per-level anchor grids. sizes/aspect_ratios follow d2 broadcasting:
    one entry used for all levels, or one entry per level."""

    def __init__(
        self,
        sizes: Sequence[Sequence[float]],
        aspect_ratios: Sequence[Sequence[float]],
        strides: Sequence[int],
        offset: float = 0.0,
    ):
        self.strides = list(strides)
        num_levels = len(strides)

        def broadcast(params):
            params = list(params)
            if len(params) == 1:
                return params * num_levels
            assert len(params) == num_levels, (params, num_levels)
            return params

        sizes = broadcast([list(s) for s in sizes])
        aspect_ratios = broadcast([list(a) for a in aspect_ratios])
        self.cell_anchors = [
            generate_cell_anchors(s, a) for s, a in zip(sizes, aspect_ratios)
        ]
        self.offset = offset
        assert 0.0 <= offset < 1.0

    @property
    def num_anchors(self) -> List[int]:
        return [len(c) for c in self.cell_anchors]

    def grid_anchors(self, grid_sizes: Sequence[Sequence[int]]) -> List[jnp.ndarray]:
        """Per-level (H*W*A, 4) anchors for the given feature grid sizes,
        row-major over (y, x, anchor) like the reference (:210-225)."""
        out = []
        for (h, w), stride, cell in zip(grid_sizes, self.strides, self.cell_anchors):
            shift_x = (np.arange(w) + self.offset) * stride
            shift_y = (np.arange(h) + self.offset) * stride
            sx, sy = np.meshgrid(shift_x, shift_y)
            shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
            anchors = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
            out.append(jnp.asarray(anchors.astype(np.float32)))
        return out


def generate_rotated_cell_anchors(
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
    angles: Sequence[float] = (-90, -60, -30, 0, 30, 60, 90),
) -> np.ndarray:
    """(S*A*T, 5) XYWHA anchors centered at (0, 0); counterpart of the
    reference ``RotatedAnchorGenerator.generate_cell_anchors``
    (detectron2/modeling/anchor_generator.py:227-378)."""
    anchors = []
    for size in sizes:
        area = size ** 2.0
        for ar in aspect_ratios:
            w = np.sqrt(area / ar)
            h = ar * w
            anchors.extend([0.0, 0.0, w, h, a] for a in angles)
    return np.asarray(anchors, dtype=np.float32)


class RotatedAnchorGenerator(AnchorGenerator):
    """Per-level rotated (XYWHA) anchor grids; d2-style broadcasting of
    sizes/aspect_ratios/angles across levels."""

    def __init__(
        self,
        sizes: Sequence[Sequence[float]],
        aspect_ratios: Sequence[Sequence[float]],
        strides: Sequence[int],
        angles: Sequence[Sequence[float]] = ((-90, -60, -30, 0, 30, 60, 90),),
        offset: float = 0.0,
    ):
        self.strides = list(strides)
        num_levels = len(strides)

        def broadcast(params):
            params = list(params)
            if len(params) == 1:
                return params * num_levels
            assert len(params) == num_levels, (params, num_levels)
            return params

        sizes = broadcast([list(s) for s in sizes])
        aspect_ratios = broadcast([list(a) for a in aspect_ratios])
        angles = broadcast([list(a) for a in angles])
        self.cell_anchors = [
            generate_rotated_cell_anchors(s, a, t)
            for s, a, t in zip(sizes, aspect_ratios, angles)
        ]
        self.offset = offset
        assert 0.0 <= offset < 1.0

    def grid_anchors(self, grid_sizes: Sequence[Sequence[int]]) -> List[jnp.ndarray]:
        """Per-level (H*W*A, 5) rotated anchors: centers shift with the grid,
        (w, h, angle) stay fixed."""
        out = []
        for (h, w), stride, cell in zip(grid_sizes, self.strides, self.cell_anchors):
            shift_x = (np.arange(w) + self.offset) * stride
            shift_y = (np.arange(h) + self.offset) * stride
            sx, sy = np.meshgrid(shift_x, shift_y)
            zeros = np.zeros_like(sx.ravel())
            shifts = np.stack([sx.ravel(), sy.ravel(), zeros, zeros, zeros], axis=1)
            anchors = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 5)
            out.append(jnp.asarray(anchors.astype(np.float32)))
        return out
