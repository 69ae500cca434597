"""Fixed-shape positive/negative sampling under a PRNG key.

Counterpart of ``subsample_labels`` (detectron2/modeling/sampling.py and the
LVC variant lvc/modeling/sampling.py:9-57). The reference returns two
variable-length index tensors; on TPU we return a fixed ``num_samples`` slot
layout: positives occupy the first ``num_pos`` slots, negatives the next
``num_neg``, and a validity mask marks unfilled slots.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Per-image sampling keys, invariant to the data-parallel decomposition.
#
# Modules derive one PRNG key per image. Under shard_map each shard traces
# with its LOCAL batch, so `jax.random.split(rng, B_local)` would repeat the
# same keys on every shard; instead keys fold in the GLOBAL image position.
# The data axis name is published at trace time by the DP train step
# (engine/train_loop.py) — outside shard_map the offset is zero, so the
# single-device step and an n-device step sample identically per image.
# ---------------------------------------------------------------------------
_SAMPLING_AXIS: Optional[str] = None


class sampling_axis_scope:
    """Trace-time context naming the mesh axis the batch is sharded on."""

    def __init__(self, axis_name: Optional[str]):
        self._axis = axis_name

    def __enter__(self):
        global _SAMPLING_AXIS
        self._saved = _SAMPLING_AXIS
        _SAMPLING_AXIS = self._axis
        return self

    def __exit__(self, *exc):
        global _SAMPLING_AXIS
        _SAMPLING_AXIS = self._saved
        return False


def per_image_keys(rng: jax.Array, batch_size: int) -> jax.Array:
    """(batch_size, key) array: fold_in(rng, global image position)."""
    pos = jnp.arange(batch_size)
    if _SAMPLING_AXIS is not None:
        pos = pos + jax.lax.axis_index(_SAMPLING_AXIS) * batch_size
    return jax.vmap(lambda p: jax.random.fold_in(rng, p))(pos)


def global_ratio(num: jnp.ndarray, den: jnp.ndarray, min_den: float = 1.0) -> jnp.ndarray:
    """``num / max(den, min_den)`` with both terms summed over the data
    axis when inside the DP shard_map: every loss normalizer goes through
    this, so each shard computes the identical GLOBAL loss value (the
    n-device step is bitwise-decomposition-invariant, modulo reduction
    order, instead of the reference DDP's mean of per-rank-normalized
    losses). The matching gradient all-reduce is a psum (each shard's
    backward produces only its local contribution to the global ratio) —
    see make_train_step."""
    if _SAMPLING_AXIS is not None:
        num = jax.lax.psum(num, _SAMPLING_AXIS)
        den = jax.lax.psum(den, _SAMPLING_AXIS)
    return num / jnp.maximum(den, min_den)


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
