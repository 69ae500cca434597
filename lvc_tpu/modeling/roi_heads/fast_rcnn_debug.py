"""Debug Fast R-CNN inference that keeps the top-2 class scores per box.

Counterpart of lvc/modeling/roi_heads/fast_rcnn_debug.py
(FastRCNNOutputsDebug:47, fast_rcnn_inference_debug:144): the reference's
debug path attaches ``top2_scores``/``top2_inds`` to each kept detection so
that the candidate-mining tool can reason about classifier ambiguity (the
fields flow into the result JSONs, cf. coco_evaluation.py:586-601).

TPU-first: the per-image variable-length debug path becomes one extra
top-2 over the (R, K) foreground score matrix, gathered at the same
fixed detection slots that ``fast_rcnn_inference`` returns.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lvc_tpu.modeling.roi_heads.fast_rcnn import (
    Detections,
    fast_rcnn_inference_single_image,
)


class DetectionsDebug(NamedTuple):
    boxes: jnp.ndarray  # (D, 4)
    scores: jnp.ndarray  # (D,)
    classes: jnp.ndarray  # (D,) int32
    valid: jnp.ndarray  # (D,) bool
    proposal_idx: jnp.ndarray  # (D,)
    top2_scores: jnp.ndarray  # (D, 2) highest two class probabilities
    top2_inds: jnp.ndarray  # (D, 2) their class indices


def fast_rcnn_inference_debug_single_image(
    boxes: jnp.ndarray,  # (R, K*4) or (R, 4)
    scores: jnp.ndarray,  # (R, K+1) softmax probabilities
    image_size: jnp.ndarray,
    proposal_valid: jnp.ndarray,
    score_thresh: float,
    nms_thresh: float,
    topk_per_image: int,
    pre_nms_candidates: int = 2048,
) -> DetectionsDebug:
    dets: Detections = fast_rcnn_inference_single_image(
        boxes,
        scores,
        image_size,
        proposal_valid,
        score_thresh,
        nms_thresh,
        topk_per_image,
        pre_nms_candidates,
    )
    fg_scores = scores[:, :-1]  # (R, K)
    top2_scores, top2_inds = jax.lax.top_k(fg_scores, 2)  # (R, 2)
    return DetectionsDebug(
        boxes=dets.boxes,
        scores=dets.scores,
        classes=dets.classes,
        valid=dets.valid,
        proposal_idx=dets.proposal_idx,
        top2_scores=top2_scores[dets.proposal_idx],
        top2_inds=top2_inds[dets.proposal_idx].astype(jnp.int32),
    )


def fast_rcnn_inference_debug(
    boxes: jnp.ndarray,  # (B, R, K*4)
    scores: jnp.ndarray,  # (B, R, K+1)
    image_sizes: jnp.ndarray,  # (B, 2)
    proposal_valid: jnp.ndarray,  # (B, R)
    score_thresh: float,
    nms_thresh: float,
    topk_per_image: int,
    pre_nms_candidates: int = 2048,
) -> DetectionsDebug:
    fn = lambda b, s, sz, v: fast_rcnn_inference_debug_single_image(
        b, s, sz, v, score_thresh, nms_thresh, topk_per_image, pre_nms_candidates
    )
    return jax.vmap(fn)(boxes, scores, image_sizes, proposal_valid)
