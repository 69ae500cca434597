"""Random Box Generator — the UBBR trainer's proposal source.

Counterpart of lvc/modeling/proposal_generator/rbg.py:10-160:
``filter_proposals`` keeps precomputed proposals with IoU > t to any gt;
``generate_proposals`` jitters each gt box with uniform offsets
tx,ty in [-alpha, alpha] and log-scales tw,th in [log(1-beta), log(1+beta)],
keeping IoU > t (alpha=0.35, beta=0.5, t=0.3 per lvc defaults.py:101-104).

TPU version: fixed budgets — the per-gt count ``2*positive_num/len(gt)``
becomes a fixed pool of ``2*positive_num`` slots assigned round-robin over
valid gts; all filtering is masking.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from lvc_tpu.structures import boxes as box_ops


class RBG(nn.Module):
    alpha: float = 0.35
    beta: float = 0.5
    t: float = 0.3
    batch_size_per_image: int = 64
    positive_fraction: float = 1.0

    @property
    def positive_num(self) -> int:
        return int(self.batch_size_per_image * self.positive_fraction)

    def __call__(
        self,
        features,  # unused; present for proposal-generator interface parity
        image_sizes: jnp.ndarray,  # (B, 2)
        gt_boxes: Optional[jnp.ndarray],
        gt_valid: Optional[jnp.ndarray],
        *,
        train: bool = False,
        proposal_boxes: Optional[jnp.ndarray] = None,  # (B, P, 4) precomputed
        proposal_logits: Optional[jnp.ndarray] = None,
        proposal_valid: Optional[jnp.ndarray] = None,
    ):
        if not train:
            return proposal_boxes, proposal_logits, proposal_valid, {}

        B = gt_boxes.shape[0]
        M = 2 * self.positive_num
        rng = self.make_rng("sampling")
        keys = jax.random.split(rng, B)

        def per_image(key, props, pvalid, gtb, gtv, size):
            # filter real proposals by IoU > t to any gt (rbg.py:73-89)
            iou = box_ops.pairwise_iou(gtb, props)
            iou = jnp.where(gtv[:, None], iou, 0.0)
            keep_real = (jnp.max(iou, axis=0) > self.t) & pvalid

            # synthesize jittered-gt proposals (rbg.py:91-160)
            n_gt = jnp.maximum(jnp.sum(gtv), 1)
            slot_gt = jnp.arange(M) % n_gt  # round-robin over valid gts
            # valid gts are not necessarily contiguous; build an index map
            gt_order = jnp.argsort(~gtv)  # valid first (stable)
            src = gtb[gt_order[slot_gt]]  # (M, 4)

            k1, k2, k3, k4 = jax.random.split(key, 4)
            tx = jax.random.uniform(k1, (M,), minval=-self.alpha, maxval=self.alpha)
            ty = jax.random.uniform(k2, (M,), minval=-self.alpha, maxval=self.alpha)
            lo, hi = math.log(1 - self.beta), math.log(1 + self.beta)
            tw = jax.random.uniform(k3, (M,), minval=lo, maxval=hi)
            th = jax.random.uniform(k4, (M,), minval=lo, maxval=hi)

            x, y = src[:, 0], src[:, 1]
            w, h = src[:, 2] - src[:, 0], src[:, 3] - src[:, 1]
            new_x = x + w * tx
            new_y = y + h * ty
            new_w = w * jnp.exp(tw)
            new_h = h * jnp.exp(th)
            gen = jnp.stack([new_x, new_y, new_x + new_w, new_y + new_h], axis=-1)
            gen = box_ops.clip(gen, size[0].astype(gen.dtype), size[1].astype(gen.dtype))
            iou_gen = jnp.where(gtv[:, None], box_ops.pairwise_iou(gtb, gen), 0.0)
            keep_gen = (jnp.max(iou_gen, axis=0) > self.t) & (jnp.sum(gtv) > 0)

            out_boxes = jnp.concatenate([props, gen], axis=0)
            out_logits = jnp.concatenate(
                [jnp.zeros(props.shape[0]), jnp.ones(M)], axis=0
            )
            out_valid = jnp.concatenate([keep_real, keep_gen], axis=0)
            return out_boxes, out_logits, out_valid

        if proposal_boxes is None:
            proposal_boxes = jnp.zeros((B, 0, 4), gt_boxes.dtype)
            proposal_logits = jnp.zeros((B, 0))
            proposal_valid = jnp.zeros((B, 0), bool)
        boxes, logits, valid = jax.vmap(per_image)(
            keys, proposal_boxes, proposal_valid, gt_boxes, gt_valid, image_sizes
        )
        return boxes, logits, valid, {}
