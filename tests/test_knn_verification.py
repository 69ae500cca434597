"""kNN verification op + ViT + pipeline tests."""
import numpy as np
import jax
import jax.numpy as jnp

from lvc_tpu.ops.knn import knn_vote, sharded_knn_vote


def _make_centers(rng, num_classes, dim=32):
    centers = rng.randn(num_classes, dim)
    return centers / np.linalg.norm(centers, axis=1, keepdims=True)


def _clustered_descriptors(rng, n_per_class, num_classes, dim=32, spread=0.05, centers=None):
    if centers is None:
        centers = _make_centers(rng, num_classes, dim)
    desc, labels = [], []
    for c in range(num_classes):
        d = centers[c] + rng.randn(n_per_class, dim) * spread
        desc.append(d)
        labels.extend([c] * n_per_class)
    return np.concatenate(desc).astype(np.float32), np.asarray(labels, np.int32)


def test_knn_vote_recovers_cluster_labels():
    rng = np.random.RandomState(0)
    centers = _make_centers(rng, 5)
    shots, shot_labels = _clustered_descriptors(rng, 30, 5, centers=centers)
    queries, query_labels = _clustered_descriptors(rng, 10, 5, centers=centers)
    topk, mode = knn_vote(
        jnp.asarray(shots), jnp.asarray(shot_labels), jnp.asarray(queries),
        k=10, cosine=True, num_classes=5,
    )
    assert topk.shape == (50, 10)
    assert (np.asarray(mode) == query_labels).mean() > 0.95


def test_knn_vote_euclid():
    rng = np.random.RandomState(1)
    centers = _make_centers(rng, 4)
    shots, shot_labels = _clustered_descriptors(rng, 20, 4, centers=centers)
    queries, query_labels = _clustered_descriptors(rng, 5, 4, centers=centers)
    _, mode = knn_vote(
        jnp.asarray(shots), jnp.asarray(shot_labels), jnp.asarray(queries),
        k=5, cosine=False, num_classes=4,
    )
    assert (np.asarray(mode) == query_labels).mean() > 0.95


def test_sharded_knn_matches_single_device():
    from jax.sharding import Mesh

    rng = np.random.RandomState(2)
    shots, shot_labels = _clustered_descriptors(rng, 25, 6)
    queries, _ = _clustered_descriptors(rng, 7, 6)  # 42 queries (pads to 48)
    topk_ref, mode_ref = knn_vote(
        jnp.asarray(shots), jnp.asarray(shot_labels), jnp.asarray(queries),
        k=10, cosine=True, num_classes=6,
    )
    mesh = Mesh(np.array(jax.devices()), axis_names=("data",))
    topk, mode = sharded_knn_vote(
        mesh, jnp.asarray(shots), jnp.asarray(shot_labels), jnp.asarray(queries),
        k=10, cosine=True, num_classes=6,
    )
    np.testing.assert_array_equal(np.asarray(topk_ref), topk)
    np.testing.assert_array_equal(np.asarray(mode_ref), mode)


def test_mode_tie_breaks_to_smallest():
    # 2 votes each for classes 1 and 3 -> mode must be 1 (torch.mode semantics)
    shots = np.array(
        [[1.0, 0.0], [0.99, 0.01], [0.0, 1.0], [0.01, 0.99]], np.float32
    )
    labels = np.array([1, 1, 3, 3], np.int32)
    q = np.array([[0.7, 0.7]], np.float32)
    _, mode = knn_vote(
        jnp.asarray(shots), jnp.asarray(labels), jnp.asarray(q), k=4, cosine=False, num_classes=5
    )
    assert int(mode[0]) == 1


def test_vit_forward_shapes():
    from lvc_tpu.modeling.backbone.vit import dino_vits8

    model = dino_vits8()
    x = jnp.zeros((2, 224, 224, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out = model.apply(variables, x)
    assert out.shape == (2, 384)
    # different resolution still works via pos-embed interpolation
    out2 = model.apply(variables, jnp.zeros((1, 96, 96, 3)))
    assert out2.shape == (1, 384)


def test_get_crops_qe_shapes():
    from lvc_tpu.data.utils import get_crops_qe

    img = (np.random.RandomState(0).rand(100, 120, 3) * 255).astype(np.uint8)
    boxes = np.array([[10, 10, 50, 30], [0, 0, 120, 100], [80, 60, 118, 98]], np.float32)
    crops = get_crops_qe(img, boxes, crop_size=64)
    assert crops.shape == (3, 64, 64, 3)
    assert crops.dtype == np.uint8
