"""CLIP (ResNet-D) and deformable bottleneck variants, CLIP optimizer,
and the analysis/env/events utilities."""
import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_clip_bottleneck_shapes_and_downsample():
    from lvc_tpu.modeling.backbone.resnet import BottleneckBlockCLIP

    blk = BottleneckBlockCLIP(
        out_channels=16, bottleneck_channels=4, stride=2, has_shortcut=True
    )
    x = jnp.ones((1, 16, 16, 8), jnp.float32)
    variables = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(variables, x)
    assert out.shape == (1, 8, 8, 16)
    # conv kernels all stride-1: downsampling is pure avg-pool
    flat = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.ndim in (1, 2, 4) for l in flat)


def test_resnet_clip_flag_builds():
    from lvc_tpu.config import get_cfg
    from lvc_tpu.modeling.backbone.resnet import build_resnet

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.D = True
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2"]
    net = build_resnet(cfg)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = net.apply(variables, x, train=False)
    assert out["res2"].shape == (1, 16, 16, 256)


def test_resnet_deform_stage_builds():
    from lvc_tpu.config import get_cfg
    from lvc_tpu.modeling.backbone.resnet import build_resnet

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [True, False, False, False]
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res2"]
    net = build_resnet(cfg)
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = net.apply(variables, x, train=False)
    assert out["res2"].shape == (1, 16, 16, 256)
    # deformable conv params present (offset conv + explicit weight)
    names = "/".join(
        str(k) for k in jax.tree_util.tree_flatten_with_path(variables["params"])[0][0][0]
    )
    flat_paths = [
        "/".join(str(getattr(p, "key", p)) for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    ]
    assert any("offset_conv" in p for p in flat_paths)


def test_clip_optimizer_scales_backbone_lr():
    import optax
    from lvc_tpu.config import get_cfg
    from lvc_tpu.solver.build import build_clip_optimizer, build_optimizer

    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.02
    cfg.SOLVER.CLIP_LR = 0.002
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.MOMENTUM = 0.0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.MODEL.BACKBONE.FREEZE_AT = 0  # keep the stem trainable for the check
    params = {
        "backbone": {"bottom_up": {"stem": {"conv": {"kernel": jnp.ones((3, 3, 3, 4))}}}},
        "roi_heads": {"box_head": {"fc1": {"kernel": jnp.ones((4, 4))}}},
    }
    grads = jax.tree_util.tree_map(jnp.ones_like, params)

    tx = build_clip_optimizer(cfg, params)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    bu = updates["backbone"]["bottom_up"]["stem"]["conv"]["kernel"]
    head = updates["roi_heads"]["box_head"]["fc1"]["kernel"]
    # head steps at BASE_LR, backbone at CLIP_LR
    np.testing.assert_allclose(np.asarray(head), -0.02, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(bu), -0.002, rtol=1e-5)


def test_parameter_count_and_flops():
    from lvc_tpu.utils.analysis import flop_count, parameter_count, parameter_count_table

    params = {
        "backbone": {"k": jnp.ones((10, 10))},
        "head": {"k": jnp.ones((5,))},
    }
    c = parameter_count(params)
    assert c[""] == 105 and c["backbone"] == 100 and c["head"] == 5
    table = parameter_count_table(params)
    assert "backbone" in table

    f = flop_count(lambda a, b: a @ b, jnp.ones((8, 16)), jnp.ones((16, 32)))
    # 2*M*N*K = 8192 flops (cost analysis may be platform dependent; >= 0)
    assert f >= 0


def test_seed_all_rng_and_collect_env():
    from lvc_tpu.utils.env import collect_env_info, seed_all_rng

    s = seed_all_rng(123)
    a = np.random.rand()
    seed_all_rng(123)
    b = np.random.rand()
    assert a == b and s == 123
    info = collect_env_info()
    assert "jax" in info


def test_event_storage_images_histograms():
    from lvc_tpu.utils.events import EventStorage

    with EventStorage(0) as storage:
        storage.put_image("img", np.zeros((4, 4, 3), np.uint8))
        storage.put_histogram("h", np.arange(100))
        assert len(storage.vis_data) == 1
        assert storage.histograms[0]["counts"].sum() == 100
        storage.clear_images()
        storage.clear_histograms()
        assert not storage.vis_data and not storage.histograms
