"""kNN label verification as a (sharded) matmul + top-k.

Counterpart of tools/run_nearest_neighbours.py:142-227: mean-centered
cosine similarity (or negative euclidean distance) between candidate and
shot descriptors, top-k shot labels, majority vote, keep iff the detector
label equals the mode.

This is the BASELINE north-star "long axis" op: shots are replicated,
queries shard over the mesh's data axis — the similarity matmul and top-k
then run fully parallel over ICI with no communication beyond the initial
shot all-gather.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _small_topk_indices(sim: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact top-k indices along the last axis via k argmax passes.

    ``lax.top_k`` lowers to a full per-row sort on TPU (~14 ms for a
    50k x 2.4k similarity matrix); for the small k of kNN voting, k
    VPU max-reductions are ~10x cheaper. Ties resolve to the lowest
    index, matching torch.topk/lax.top_k ordering.
    """
    if k >= sim.shape[-1]:
        return jax.lax.top_k(sim, k)[1]
    neg_inf = jnp.asarray(-jnp.inf, sim.dtype)
    idxs = []
    cur = sim
    for _ in range(k):
        best = jnp.argmax(cur, axis=-1)
        idxs.append(best)
        cur = jnp.where(
            jax.nn.one_hot(best, sim.shape[-1], dtype=bool), neg_inf, cur
        )
    return jnp.stack(idxs, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "cosine", "num_classes"))
def knn_vote(
    shot_descriptors: jnp.ndarray,  # (S, D)
    shot_classes: jnp.ndarray,  # (S,)
    query_descriptors: jnp.ndarray,  # (Q, D)
    k: int = 10,
    cosine: bool = True,
    num_classes: int = 80,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (topk_labels (Q, k), mode_label (Q,)).

    Mode ties resolve to the smallest class id (torch.mode semantics).
    ``k`` is clamped to the gallery size (fewer shots than k just votes
    over all of them, like faiss returning every neighbour).
    """
    k = min(k, shot_descriptors.shape[0])
    if cosine:
        center = jnp.mean(shot_descriptors, axis=0, keepdims=True)
        s = shot_descriptors - center
        q = query_descriptors - center
        s = s / (jnp.linalg.norm(s, axis=-1, keepdims=True) + 1e-8)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-8)
        sim = q @ s.T  # (Q, S) — the MXU matmul
    else:
        # negative euclidean distance
        q2 = jnp.sum(query_descriptors**2, axis=-1, keepdims=True)
        s2 = jnp.sum(shot_descriptors**2, axis=-1)
        sim = -(q2 - 2 * query_descriptors @ shot_descriptors.T + s2[None, :])
    idx = _small_topk_indices(sim, k)
    topk_labels = shot_classes[idx]  # (Q, k)
    votes = jax.nn.one_hot(topk_labels, num_classes, dtype=jnp.int32).sum(axis=1)
    mode = jnp.argmax(votes, axis=-1).astype(jnp.int32)  # ties -> smallest id
    return topk_labels, mode


def sharded_knn_vote(
    mesh: Mesh,
    shot_descriptors: jnp.ndarray,
    shot_classes: jnp.ndarray,
    query_descriptors: jnp.ndarray,
    k: int = 10,
    cosine: bool = True,
    num_classes: int = 80,
) -> Tuple[np.ndarray, np.ndarray]:
    """Queries sharded over the mesh data axis, shots replicated. Pads the
    query axis to the mesh size and strips the padding after."""
    n_dev = mesh.devices.size
    Q = query_descriptors.shape[0]
    q_pad = (-Q) % n_dev
    if q_pad:
        query_descriptors = jnp.pad(query_descriptors, ((0, q_pad), (0, 0)))

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P("data"))
    fn = jax.jit(
        lambda s, c, q: knn_vote(s, c, q, k=k, cosine=cosine, num_classes=num_classes),
        in_shardings=(replicated, replicated, sharded),
        out_shardings=(sharded, sharded),
    )
    with mesh:
        s = jax.device_put(shot_descriptors, replicated)
        c = jax.device_put(shot_classes, replicated)
        q = jax.device_put(query_descriptors, sharded)
        topk, mode = fn(s, c, q)
    topk = np.asarray(topk)[:Q]
    mode = np.asarray(mode)[:Q]
    return topk, mode
