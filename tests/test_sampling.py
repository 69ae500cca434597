import numpy as np
import jax
import jax.numpy as jnp

from lvc_tpu.modeling.sampling import subsample_labels


def test_balanced_sampling():
    labels = np.full(100, -1, np.int32)
    labels[:30] = 1
    labels[30:90] = 0
    idxs, is_pos, valid = subsample_labels(jax.random.PRNGKey(0), jnp.asarray(labels), 64, 0.25)
    idxs, is_pos, valid = map(np.asarray, (idxs, is_pos, valid))
    assert valid.all()
    assert is_pos.sum() == 16  # 64 * 0.25
    assert (labels[idxs[is_pos]] == 1).all()
    assert (labels[idxs[valid & ~is_pos]] == 0).all()
    # no duplicates among valid
    assert len(set(idxs[valid].tolist())) == valid.sum()


def test_fewer_positives_than_quota():
    labels = np.full(50, 0, np.int32)
    labels[:3] = 1
    idxs, is_pos, valid = subsample_labels(jax.random.PRNGKey(1), jnp.asarray(labels), 32, 0.5)
    idxs, is_pos, valid = map(np.asarray, (idxs, is_pos, valid))
    assert is_pos.sum() == 3  # all positives taken
    assert valid.sum() == 32  # rest filled with negatives


def test_not_enough_everything():
    labels = np.full(20, -1, np.int32)
    labels[0] = 1
    labels[1] = 0
    idxs, is_pos, valid = subsample_labels(jax.random.PRNGKey(2), jnp.asarray(labels), 16, 0.25)
    idxs, is_pos, valid = map(np.asarray, (idxs, is_pos, valid))
    assert valid.sum() == 2
    assert is_pos.sum() == 1
    assert set(idxs[valid].tolist()) == {0, 1}


def test_randomness_depends_on_key():
    labels = np.zeros(200, np.int32)
    labels[:100] = 1
    a, _, _ = subsample_labels(jax.random.PRNGKey(0), jnp.asarray(labels), 32, 0.5)
    b, _, _ = subsample_labels(jax.random.PRNGKey(1), jnp.asarray(labels), 32, 0.5)
    assert not np.array_equal(np.asarray(a), np.asarray(b))
