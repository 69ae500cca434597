"""Proposal/anchor-to-gt matcher, fixed-shape and mask-aware.

Behavioral port of the reference Matcher (detectron2/modeling/matcher.py:8-130)
to padded arrays: ground-truth rows carry a validity mask instead of a
variable length, so the whole thing jits. Label semantics {-1, 0, 1} =
{ignore, negative, positive} per threshold band are identical.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


class Matcher:
    def __init__(
        self,
        thresholds: Sequence[float],
        labels: Sequence[int],
        allow_low_quality_matches: bool = False,
    ):
        thresholds = list(thresholds)
        assert thresholds[0] > 0
        assert all(lo <= hi for lo, hi in zip(thresholds[:-1], thresholds[1:]))
        assert all(l in (-1, 0, 1) for l in labels)
        assert len(labels) == len(thresholds) + 1
        self.thresholds = [-float("inf")] + thresholds + [float("inf")]
        self.labels = list(labels)
        self.allow_low_quality_matches = allow_low_quality_matches

    def __call__(
        self, match_quality_matrix: jnp.ndarray, gt_valid: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Args:
            match_quality_matrix: (M, N) qualities (>= 0), rows = gt (padded).
            gt_valid: (M,) bool mask of real gt rows.
        Returns:
            matches: (N,) int32 index into [0, M) of best gt per prediction.
            match_labels: (N,) int8 in {-1, 0, 1}.

        With zero valid gt the reference defines IoU = 0 for everything and
        labels everything ``labels[0]`` (matcher.py:77-88); masking invalid
        rows to -1 then flooring matched_vals at 0 reproduces that.
        """
        quality = jnp.where(gt_valid[:, None], match_quality_matrix, -1.0)
        matched_vals = jnp.max(quality, axis=0)
        matches = jnp.argmax(quality, axis=0).astype(jnp.int32)
        # No-valid-gt rows: reference treats quality as all-zero.
        matched_vals = jnp.maximum(matched_vals, 0.0)
        any_valid = jnp.any(gt_valid)
        matched_vals = jnp.where(any_valid, matched_vals, 0.0)

        match_labels = jnp.full(matches.shape, 1, dtype=jnp.int8)
        for label, low, high in zip(self.labels, self.thresholds[:-1], self.thresholds[1:]):
            in_band = (matched_vals >= low) & (matched_vals < high)
            match_labels = jnp.where(in_band, jnp.int8(label), match_labels)

        if self.allow_low_quality_matches:
            match_labels = self._set_low_quality_matches(
                match_labels, match_quality_matrix, gt_valid
            )
        return matches, match_labels

    def _set_low_quality_matches(
        self,
        match_labels: jnp.ndarray,
        match_quality_matrix: jnp.ndarray,
        gt_valid: jnp.ndarray,
    ) -> jnp.ndarray:
        """For each valid gt, label its max-quality predictions (incl. ties)
        positive — RPN case (i), matcher.py:105-130. Guarded to positive
        qualities (a gt overlapping nothing recruits no anchors)."""
        quality = jnp.where(gt_valid[:, None], match_quality_matrix, -1.0)
        highest_per_gt = jnp.max(quality, axis=1, keepdims=True)
        is_best = (quality == highest_per_gt) & (highest_per_gt > 0) & gt_valid[:, None]
        recruited = jnp.any(is_best, axis=0)
        return jnp.where(recruited, jnp.int8(1), match_labels)
