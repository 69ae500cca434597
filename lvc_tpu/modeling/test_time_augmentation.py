"""Test-time augmentation: multi-scale + flip inference with NMS merge.

Counterpart of detectron2/modeling/test_time_augmentation.py
(DatasetMapperTTA, GeneralizedRCNNWithTTA) driven by ``cfg.TEST.AUG.*``.

TPU-first split of responsibilities: the host produces one padded batch
per (min_size, flip) variant (all variants of one image share a canvas
bucket so the same compiled program serves every scale), each variant runs
through the standard jitted eval step, detections are mapped back to
original-image coordinates with cheap numpy math, and the cross-variant
merge is one fixed-shape class-aware NMS on device — the same kernel the
detector itself uses, rather than a bespoke merging routine.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from lvc_tpu.data import transforms as T
from lvc_tpu.data.dataset_mapper import pick_canvas
from lvc_tpu.ops.nms import batched_nms_mask, masked_topk


class DatasetMapperTTA:
    """Produce one model batch per (scale, flip) variant of an image.

    Mirrors d2's DatasetMapperTTA: ``min_sizes x {identity, hflip}``.
    Each returned dict carries ``tta_scale`` (resized/original) and
    ``tta_flip`` so detections can be mapped back.
    """

    def __init__(self, cfg):
        self.min_sizes: Sequence[int] = tuple(cfg.TEST.AUG.MIN_SIZES)
        self.max_size: int = cfg.TEST.AUG.MAX_SIZE
        self.flip: bool = cfg.TEST.AUG.FLIP
        self.buckets = [tuple(b) for b in cfg.PAD.CANVAS_BUCKETS]

    def __call__(self, image: np.ndarray) -> List[Dict[str, np.ndarray]]:
        orig_h, orig_w = image.shape[:2]
        out = []
        for short in self.min_sizes:
            resized, _, _ = T.resize_shortest_edge(image, None, short, self.max_size)
            for flip in (False, True) if self.flip else (False,):
                img = resized[:, ::-1] if flip else resized
                h, w = img.shape[:2]
                ch, cw = pick_canvas(h, w, self.buckets)
                padded = np.zeros((ch, cw, 3), np.float32)
                padded[:h, :w] = img
                out.append(
                    {
                        "image": padded,
                        "image_size": np.array([h, w], np.int32),
                        "tta_scale": np.array(
                            [h / orig_h, w / orig_w], np.float32
                        ),
                        "tta_flip": flip,
                        "tta_width": w,
                    }
                )
        return out


def _boxes_to_original(
    boxes: np.ndarray, scale_hw: np.ndarray, flip: bool, variant_width: int
) -> np.ndarray:
    """Undo flip then rescale XYXY boxes to original-image coordinates."""
    b = boxes.copy()
    if flip:
        x0 = variant_width - b[:, 2]
        x1 = variant_width - b[:, 0]
        b[:, 0], b[:, 2] = x0, x1
    b[:, [0, 2]] /= scale_hw[1]
    b[:, [1, 3]] /= scale_hw[0]
    return b


def merge_tta_detections(
    boxes: jnp.ndarray,  # (N, 4) original-coordinate boxes, all variants
    scores: jnp.ndarray,  # (N,)
    classes: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,)
    nms_thresh: float,
    topk: int,
):
    """Class-aware NMS across the union of all variants' detections."""
    keep = batched_nms_mask(boxes, scores, classes, valid, nms_thresh)
    order, ok = masked_topk(scores, keep, topk)
    return boxes[order], scores[order], classes[order], ok


class GeneralizedRCNNWithTTA:
    """Wrap a jitted single-batch eval step with multi-scale/flip TTA.

    ``eval_fn(batch) -> Detections`` must accept the standard eval batch
    contract and return padded Detections (as make_eval_step produces).
    """

    def __init__(self, cfg, eval_fn: Callable, tta_mapper: DatasetMapperTTA = None):
        self.cfg = cfg
        self.eval_fn = eval_fn
        self.tta_mapper = tta_mapper or DatasetMapperTTA(cfg)
        self.nms_thresh = cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST
        self.topk = cfg.TEST.DETECTIONS_PER_IMAGE

    def __call__(self, image: np.ndarray):
        """image: (H, W, 3) in cfg INPUT.FORMAT order. Returns numpy
        (boxes, scores, classes, valid) in original coordinates."""
        variants = self.tta_mapper(image)
        all_boxes, all_scores, all_classes, all_valid = [], [], [], []
        for v in variants:
            batch = {"image": v["image"][None], "image_size": v["image_size"][None]}
            dets = self.eval_fn(batch)
            boxes = np.asarray(dets.boxes)[0]
            boxes = _boxes_to_original(
                boxes, v["tta_scale"], v["tta_flip"], v["tta_width"]
            )
            all_boxes.append(boxes)
            all_scores.append(np.asarray(dets.scores)[0])
            all_classes.append(np.asarray(dets.classes)[0])
            all_valid.append(np.asarray(dets.valid)[0])
        boxes = jnp.asarray(np.concatenate(all_boxes))
        scores = jnp.asarray(np.concatenate(all_scores))
        classes = jnp.asarray(np.concatenate(all_classes))
        valid = jnp.asarray(np.concatenate(all_valid))
        b, s, c, ok = merge_tta_detections(
            boxes, scores, classes, valid, self.nms_thresh, self.topk
        )
        return np.asarray(b), np.asarray(s), np.asarray(c), np.asarray(ok)
