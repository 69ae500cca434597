"""Checkpoint conversion round-trip + surgery workflow tests."""
import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import os
import subprocess
import sys

import numpy as np
import jax
import pytest

from lvc_tpu.config import get_cfg
from lvc_tpu.checkpoint.convert import flax_to_torch, torch_to_flax
from lvc_tpu.checkpoint.checkpointer import DetectionCheckpointer
from lvc_tpu.engine.train_loop import TrainState
from lvc_tpu.modeling.meta_arch.build import build_model
from lvc_tpu.solver.build import build_optimizer

import __graft_entry__ as g

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_model(num_classes=6, cosine=False):
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs/Base-RCNN-FPN.yaml"))
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = num_classes
    if cosine:
        cfg.MODEL.ROI_HEADS.OUTPUT_LAYER = "CosineSimOutputLayers"
    model = build_model(cfg)
    batch = g._make_batch(B=1, H=128, W=128)
    variables = g.fast_init(model, {"params": jax.random.PRNGKey(0)}, batch, train=False)
    return cfg, model, variables


def test_conversion_roundtrip():
    cfg, model, variables = make_model()
    sd = flax_to_torch(variables)
    # all names look like d2 names
    assert "backbone.bottom_up.stem.conv1.weight" in sd
    assert "backbone.bottom_up.res2.0.conv1.norm.running_mean" in sd
    assert "proposal_generator.rpn_head.objectness_logits.weight" in sd
    assert "roi_heads.box_predictor.cls_score.weight" in sd
    assert sd["roi_heads.box_predictor.cls_score.weight"].shape == (7, 1024)
    back = torch_to_flax(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    from flax.traverse_util import flatten_dict

    a = flatten_dict(variables["params"])
    b = flatten_dict(back["params"])
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), b[k], err_msg=str(k))
    sa = flatten_dict(variables["batch_stats"])
    sb = flatten_dict(back["batch_stats"])
    assert set(sa) == set(sb)


def test_conversion_roundtrip_cosine():
    cfg, model, variables = make_model(cosine=True)
    sd = flax_to_torch(variables)
    assert "roi_heads.box_predictor.cls_score.weight" in sd
    assert "roi_heads.box_predictor.cls_score.bias" not in sd
    back = torch_to_flax(sd)
    from flax.traverse_util import flatten_dict

    a = flatten_dict(variables["params"])
    b = flatten_dict(back["params"])
    assert set(a) == set(b)


def test_save_load_ckpt(tmp_path):
    cfg, model, variables = make_model()
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables, tx)
    ckpt = DetectionCheckpointer(state, str(tmp_path))
    ckpt.save("model_0000099", state)
    assert ckpt.has_checkpoint()
    state2, resumed = ckpt.resume_or_load("", state, resume=True)
    assert resumed
    from flax.traverse_util import flatten_dict

    a = flatten_dict(state.params)
    b = flatten_dict(state2.params)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_surgery_workflow(tmp_path):
    """base(60) -> remove -> novel(20) load; base+novel -> combine -> all(80)."""
    import torch

    cfg60, _, vars60 = make_model(num_classes=60)
    sd = flax_to_torch(vars60)
    base_pth = str(tmp_path / "base.pth")
    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}}, base_pth)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # remove
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/ckpt_surgery.py"),
         "--src1", base_pth, "--method", "remove", "--save-dir", str(tmp_path), "--coco"],
        check=True, env=env,
    )
    removed = str(tmp_path / "model_reset_remove.pth")
    sd_removed = torch.load(removed, weights_only=False)["model"]
    assert "roi_heads.box_predictor.cls_score.weight" not in sd_removed
    assert "backbone.bottom_up.stem.conv1.weight" in sd_removed

    # load 'removed' into a 20-class model: predictor stays at init
    cfg20, model20, vars20 = make_model(num_classes=20)
    tx = build_optimizer(cfg20, vars20["params"])
    state20 = TrainState.create(vars20, tx)
    ckpt = DetectionCheckpointer(state20, str(tmp_path))
    state20b = ckpt.load(removed, state20)
    np.testing.assert_array_equal(
        np.asarray(state20b.params["backbone"]["bottom_up"]["stem"]["conv1"]["conv"]["kernel"]),
        np.asarray(vars60["params"]["backbone"]["bottom_up"]["stem"]["conv1"]["conv"]["kernel"]),
    )

    # combine base(60) + novel(20) -> 80
    sd20 = flax_to_torch(vars20)
    novel_pth = str(tmp_path / "novel.pth")
    torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd20.items()}}, novel_pth)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/ckpt_surgery.py"),
         "--src1", base_pth, "--src2", novel_pth, "--method", "combine",
         "--save-dir", str(tmp_path), "--coco"],
        check=True, env=env,
    )
    combined = str(tmp_path / "model_reset_combine.pth")
    sdc = torch.load(combined, weights_only=False)["model"]
    W = sdc["roi_heads.box_predictor.cls_score.weight"].numpy()
    assert W.shape == (81, 1024)
    # base class 8 (truck) has contiguous all-index 7, base-index 0
    W60 = sd["roi_heads.box_predictor.cls_score.weight"]
    W20 = sd20["roi_heads.box_predictor.cls_score.weight"]
    np.testing.assert_array_equal(W[7], W60[0])
    # novel class 1 (person) -> all-index 0, novel-index 0
    np.testing.assert_array_equal(W[0], W20[0])
    # bg row from base
    np.testing.assert_array_equal(W[80], W60[60])
    # bbox rows
    B = sdc["roi_heads.box_predictor.bbox_pred.weight"].numpy()
    assert B.shape == (320, 1024)
    B60 = sd["roi_heads.box_predictor.bbox_pred.weight"]
    np.testing.assert_array_equal(B[7 * 4 : 8 * 4], B60[0:4])

    # the combined checkpoint loads into an 80-class model
    cfg80, model80, vars80 = make_model(num_classes=80)
    tx80 = build_optimizer(cfg80, vars80["params"])
    state80 = TrainState.create(vars80, tx80)
    ckpt80 = DetectionCheckpointer(state80, str(tmp_path))
    state80b = ckpt80.load(combined, state80)
    np.testing.assert_array_equal(
        np.asarray(state80b.params["roi_heads"]["box_predictor"]["cls_score"]["kernel"]).T,
        W,
    )
