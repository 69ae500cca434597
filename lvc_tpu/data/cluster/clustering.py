"""Feature clustering: PCA-whitening + L2 + k-means.

Counterpart of lvc/data/cluster/clustering.py:1-96 (preprocess_features,
run_kmeans, Kmeans) — the reference's only faiss dependency. TPU-native:
PCA via jnp.linalg.eigh on the covariance and k-means as a jitted
Lloyd's iteration whose assignment step is one (N, D) x (D, K) matmul on
the MXU — no faiss, no GPU index.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def preprocess_features(x: np.ndarray, pca_dim: int = 256, eps: float = 1e-5):
    """PCA-reduce (with whitening) then L2-normalize row features.

    Returns (features (N, pca_dim), (mean, components) to apply to new
    data). Matches the reference's PCA+L2 pipeline semantics.
    """
    x = jnp.asarray(x, jnp.float32)
    mean = x.mean(axis=0)
    xc = x - mean
    cov = (xc.T @ xc) / x.shape[0]
    eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
    order = jnp.argsort(-eigvals)[:pca_dim]
    components = eigvecs[:, order] * jax.lax.rsqrt(eigvals[order] + eps)[None, :]
    out = xc @ components
    out = out / (jnp.linalg.norm(out, axis=1, keepdims=True) + 1e-10)
    return np.asarray(out), (np.asarray(mean), np.asarray(components))


def _kmeans_step(data: jnp.ndarray, centroids: jnp.ndarray):
    """One Lloyd iteration. Assignment = argmax of the dot-product form
    (rows are L2-normalized upstream, but the general squared-distance
    expansion is used so unnormalized data also works)."""
    d2 = (
        jnp.sum(centroids ** 2, axis=1)[None, :]
        - 2.0 * jnp.dot(data, centroids.T, preferred_element_type=jnp.float32)
    )  # (N, K); the ||x||^2 term is assignment-invariant
    assign = jnp.argmin(d2, axis=1)
    k = centroids.shape[0]
    onehot = jax.nn.one_hot(assign, k, dtype=data.dtype)  # (N, K)
    counts = onehot.sum(axis=0)  # (K,)
    sums = jnp.dot(onehot.T, data, preferred_element_type=jnp.float32)  # (K, D)
    new_centroids = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids
    )
    inertia = jnp.sum(jnp.min(d2, axis=1) + jnp.sum(data ** 2, axis=1))
    return new_centroids.astype(data.dtype), assign, inertia


@jax.jit
def _kmeans_run(data: jnp.ndarray, init_centroids: jnp.ndarray, n_iter: int = 20):
    def body(i, state):
        centroids, _, _ = state
        return _kmeans_step(data, centroids)

    assign0 = jnp.zeros((data.shape[0],), jnp.int32)
    return jax.lax.fori_loop(
        0, n_iter, body, (init_centroids, assign0, jnp.float32(0.0))
    )


def run_kmeans(
    x: np.ndarray, nmb_clusters: int, n_iter: int = 20, seed: int = 0
) -> Tuple[np.ndarray, float]:
    """k-means labels for each row of x (reference run_kmeans surface)."""
    data = jnp.asarray(x, jnp.float32)
    rng = np.random.RandomState(seed)
    init_idx = rng.choice(x.shape[0], size=min(nmb_clusters, x.shape[0]), replace=False)
    init = data[jnp.asarray(init_idx)]
    if init.shape[0] < nmb_clusters:  # degenerate tiny-N case
        pad = jnp.tile(init[:1], (nmb_clusters - init.shape[0], 1))
        init = jnp.concatenate([init, pad], axis=0)
    _, assign, inertia = _kmeans_run(data, init, n_iter)
    return np.asarray(assign), float(inertia)


class Kmeans:
    """Object wrapper mirroring the reference's ``Kmeans`` class: holds k,
    exposes ``cluster(data)`` -> populates ``images_lists`` (per-cluster
    row-index lists)."""

    def __init__(self, k: int, pca_dim: int = 256, n_iter: int = 20, seed: int = 0):
        self.k = k
        self.pca_dim = pca_dim
        self.n_iter = n_iter
        self.seed = seed
        self.images_lists = None

    def cluster(self, data: np.ndarray, verbose: bool = False) -> float:
        xb, _ = preprocess_features(data, min(self.pca_dim, data.shape[1]))
        labels, loss = run_kmeans(xb, self.k, self.n_iter, self.seed)
        self.images_lists = [[] for _ in range(self.k)]
        for i, lbl in enumerate(labels):
            self.images_lists[int(lbl)].append(i)
        if verbose:
            print(f"k-means loss: {loss:.4f}")
        return loss
