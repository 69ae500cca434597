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


def test_rpn_ignore_regions_excluded_from_loss():
    """RPN_Ignore semantics (reference lvc rpn.py:25-90 — shipped as an
    unfinished stub; completed here): an ignore gt region's anchors are
    excluded from the RPN loss entirely. A single huge ignore box covering
    the whole image makes every anchor label -1 => zero sampled slots =>
    zero losses; with ignore_regions off the same gt yields real losses."""
    import jax
    import jax.numpy as jnp

    from lvc_tpu.modeling.proposal_generator.rpn import RPN

    def make(flag):
        return RPN(
            in_features=("p2",),
            strides={"p2": 4},
            anchor_sizes=((32,),),
            anchor_aspect_ratios=((1.0,),),
            iou_thresholds=(0.3, 0.7),
            iou_labels=(0, -1, 1),
            batch_size_per_image=16,
            positive_fraction=0.5,
            pre_nms_topk_train=16,
            post_nms_topk_train=8,
            pre_nms_topk_test=16,
            post_nms_topk_test=8,
            ignore_regions=flag,
        )

    feats = {"p2": jnp.zeros((1, 16, 16, 8), jnp.float32)}
    sizes = jnp.asarray([[64, 64]], jnp.int32)
    # covers the full extent of every anchor (edge anchors stick out of the
    # image; exclusion is intersection-over-anchor-area > 0.5)
    gt_boxes = jnp.asarray([[[-16.0, -16.0, 80.0, 80.0]]])
    gt_valid = jnp.ones((1, 1), bool)
    gt_ignores = jnp.ones((1, 1), bool)

    rngs = {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}
    out = {}
    for flag in (False, True):
        rpn = make(flag)
        variables = rpn.init(
            rngs, feats, sizes, gt_boxes, gt_valid, gt_ignores, train=True
        )
        _, _, _, losses = rpn.apply(
            variables, feats, sizes, gt_boxes, gt_valid, gt_ignores,
            train=True, rngs={"sampling": jax.random.PRNGKey(1)},
        )
        out[flag] = {k: float(v) for k, v in losses.items()}
    assert out[True]["loss_rpn_cls"] == 0.0, out[True]
    assert out[True]["loss_rpn_loc"] == 0.0, out[True]
    assert out[False]["loss_rpn_cls"] > 0.0, out[False]


def test_per_image_keys_decomposition_invariant():
    """Keys under an 8-shard mesh (local B=1) == keys single-device (B=8)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from lvc_tpu.modeling.sampling import per_image_keys, sampling_axis_scope

    rng = jax.random.PRNGKey(3)
    with sampling_axis_scope(None):
        full = per_image_keys(rng, 8)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    sharded_fn = jax.shard_map(
        lambda r: per_image_keys(r, 1),
        mesh=mesh, in_specs=P(), out_specs=P("data"),
    )
    # the scope is read at TRACE time, so it must wrap the call
    with sampling_axis_scope("data"):
        sharded = sharded_fn(rng)
    np.testing.assert_array_equal(
        jax.random.key_data(full), jax.random.key_data(sharded)
    )


def test_global_ratio_value_and_grad_decomposition_invariant():
    """global_ratio under shard_map: the loss value equals the global
    ratio on every shard, and the gradient w.r.t. a replicated parameter
    equals the single-device gradient (no axis-size factor)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from lvc_tpu.modeling.sampling import global_ratio, sampling_axis_scope

    x = np.arange(1.0, 9.0, dtype=np.float32)  # 8 "per-image" numerators
    den = np.asarray([1.0, 0.0, 2.0, 1.0, 0.0, 1.0, 3.0, 1.0], np.float32)
    w0 = jnp.asarray(2.0)

    def loss_single(w):
        with sampling_axis_scope(None):
            return global_ratio(jnp.sum(w * jnp.asarray(x)), jnp.sum(jnp.asarray(den)))

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def shard_body(w, xs, ds):
        with sampling_axis_scope("data"):
            return global_ratio(jnp.sum(w * xs), jnp.sum(ds))

    def loss_sharded(w):
        out = jax.shard_map(
            lambda w_, xs, ds: shard_body(w_, xs, ds),
            mesh=mesh, in_specs=(P(), P("data"), P("data")), out_specs=P(),
        )(w, jnp.asarray(x), jnp.asarray(den))
        return out

    v1, g1 = jax.value_and_grad(loss_single)(w0)
    v8, g8 = jax.value_and_grad(loss_sharded)(w0)
    np.testing.assert_allclose(float(v1), float(v8), rtol=1e-6)
    np.testing.assert_allclose(float(g1), float(g8), rtol=1e-6)
