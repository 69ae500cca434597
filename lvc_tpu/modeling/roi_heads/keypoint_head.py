"""Keypoint R-CNN head (flax, fixed-shape).

Behavioral counterpart of detectron2/modeling/roi_heads/keypoint_head.py
(KRCNNConvDeconvUpsampleHead, keypoint_rcnn_loss, keypoint_rcnn_inference).
Unused by the LVC pipeline but part of the vendored surface. TPU-first:
the per-roi keypoint-to-heatmap-bin rasterization and the argmax decode are
fixed-shape index math over padded slots instead of variable-length
per-image tensors.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from lvc_tpu.modeling.sampling import global_ratio
import flax.linen as nn


class KRCNNConvDeconvUpsampleHead(nn.Module):
    """N convs -> 2x deconv -> 2x bilinear upsample; K keypoint heatmaps."""

    num_keypoints: int = 17
    num_conv: int = 8
    conv_dim: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, P, P, C) -> (N, 4P, 4P, K) heatmap logits."""
        init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
        for i in range(self.num_conv):
            x = nn.Conv(self.conv_dim, (3, 3), kernel_init=init, name=f"conv_fcn{i + 1}")(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2), kernel_init=init, name="score_lowres"
        )(x)
        n, h, w, k = x.shape
        return jax.image.resize(x, (n, 2 * h, 2 * w, k), method="bilinear")


def keypoints_to_heatmap_targets(
    keypoints: jnp.ndarray,  # (S, K, 3) (x, y, visibility) image coords
    boxes: jnp.ndarray,  # (S, 4)
    heatmap_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bin each visible keypoint into its roi heatmap cell
    (structures/keypoints.py to_heatmap semantics). Returns flat bin index
    (S, K) and validity (S, K)."""
    M = heatmap_size
    x, y, vis = keypoints[..., 0], keypoints[..., 1], keypoints[..., 2]
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-4)[:, None]
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-4)[:, None]
    gx = (x - boxes[:, 0:1]) / bw * M
    gy = (y - boxes[:, 1:2]) / bh * M
    ix = jnp.floor(gx).astype(jnp.int32)
    iy = jnp.floor(gy).astype(jnp.int32)
    # a keypoint exactly on the roi's right/bottom edge bins into the last
    # cell and stays valid (keypoints.py:122-132 boundary_inds rule)
    ix = jnp.where(x == boxes[:, 2:3], M - 1, ix)
    iy = jnp.where(y == boxes[:, 3:4], M - 1, iy)
    inside = (ix >= 0) & (ix < M) & (iy >= 0) & (iy < M)
    ix = jnp.clip(ix, 0, M - 1)
    iy = jnp.clip(iy, 0, M - 1)
    return iy * M + ix, inside & (vis > 0)


def keypoint_rcnn_loss(
    kp_logits: jnp.ndarray,  # (S, M, M, K)
    keypoints: jnp.ndarray,  # (S, K, 3)
    boxes: jnp.ndarray,  # (S, 4)
    fg: jnp.ndarray,  # (S,)
    normalizer: float | None = None,
) -> jnp.ndarray:
    """Softmax CE over the M*M bins of each visible keypoint."""
    S, M, _, K = kp_logits.shape
    targets, valid = keypoints_to_heatmap_targets(keypoints, boxes, M)
    valid = valid & fg[:, None]
    flat = kp_logits.reshape(S, M * M, K).transpose(0, 2, 1)  # (S, K, M*M)
    logp = jax.nn.log_softmax(flat, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[:, :, None], axis=-1)[..., 0]  # (S, K)
    n = jnp.sum(valid).astype(jnp.float32) if normalizer is None else jnp.asarray(normalizer, jnp.float32)
    return global_ratio(jnp.sum(jnp.where(valid, ce, 0.0)), n)


def keypoint_rcnn_inference(
    kp_logits: jnp.ndarray,  # (D, M, M, K)
    boxes: jnp.ndarray,  # (D, 4)
) -> jnp.ndarray:
    """Decode heatmap argmaxes to image-coordinate keypoints (D, K, 3):
    (x, y, score)."""
    D, M, _, K = kp_logits.shape
    flat = kp_logits.reshape(D, M * M, K)
    idx = jnp.argmax(flat, axis=1)  # (D, K)
    score = jax.nn.softmax(flat, axis=1)
    score = jnp.take_along_axis(score, idx[:, None, :], axis=1)[:, 0, :]  # (D, K)
    iy = (idx // M).astype(jnp.float32) + 0.5
    ix = (idx % M).astype(jnp.float32) + 0.5
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-4)[:, None]
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-4)[:, None]
    x = boxes[:, 0:1] + ix / M * bw
    y = boxes[:, 1:2] + iy / M * bh
    return jnp.stack([x, y, score], axis=-1)
