"""Fixed-shape positive/negative sampling under a PRNG key.

Counterpart of ``subsample_labels`` (detectron2/modeling/sampling.py and the
LVC variant lvc/modeling/sampling.py:9-57). The reference returns two
variable-length index tensors; on TPU we return a fixed ``num_samples`` slot
layout: positives occupy the first ``num_pos`` slots, negatives the next
``num_neg``, and a validity mask marks unfilled slots.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def subsample_labels(
    key: jax.Array,
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Args:
        labels: (N,) int; 1 = positive, 0 = negative, -1 = ignore. Padding
            rows must already be -1.
    Returns:
        idxs: (num_samples,) int32 indices into labels.
        is_positive: (num_samples,) bool.
        slot_valid: (num_samples,) bool — False for unfilled slots.
    """
    n = labels.shape[0]
    pos = labels == 1
    neg = labels == 0
    k_pos, k_neg = jax.random.split(key)

    # Random subset of positives/negatives via top-k over random priorities
    # (a full argsort of N=~280k anchors cost ~8 ms/step; only the first
    # num_samples entries of the permutation are ever read).
    k = min(num_samples, n)
    pos_pri = jnp.where(pos, jax.random.uniform(k_pos, (n,)), jnp.inf)
    neg_pri = jnp.where(neg, jax.random.uniform(k_neg, (n,)), jnp.inf)
    _, pos_order = jax.lax.top_k(-pos_pri, k)
    _, neg_order = jax.lax.top_k(-neg_pri, k)

    avail_pos = jnp.sum(pos)
    avail_neg = jnp.sum(neg)
    max_pos = int(num_samples * positive_fraction)
    num_pos = jnp.minimum(avail_pos, max_pos)
    num_neg = jnp.minimum(avail_neg, num_samples - num_pos)

    slot = jnp.arange(num_samples)
    is_pos_slot = slot < num_pos
    neg_slot = jnp.clip(slot - num_pos, 0, k - 1)
    idxs = jnp.where(is_pos_slot, pos_order[jnp.clip(slot, 0, k - 1)], neg_order[neg_slot])
    slot_valid = slot < (num_pos + num_neg)
    return idxs.astype(jnp.int32), is_pos_slot & slot_valid, slot_valid
