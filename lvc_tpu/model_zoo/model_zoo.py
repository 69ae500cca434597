"""Released-checkpoint URL table + loaders.

Counterpart of lvc/model_zoo/model_zoo.py:11-182: the FsDet/LVC checkpoint
table (generated programmatically — same config-path -> URL mapping), plus
get_checkpoint_url / get_config_file / get. ``get`` loads the (torch)
checkpoint through our converter into a flax model + TrainState.
"""
from __future__ import annotations

import os
from typing import Dict

URL_PREFIX = "http://dl.yf.io/fs-det/models/"

def _build_table() -> Dict[str, str]:
    t: Dict[str, str] = {}
    # PASCAL VOC: base + three method families x splits x shots
    for s in (1, 2, 3):
        t[f"PascalVOC-detection/split{s}/faster_rcnn_R_101_FPN_base{s}.yaml"] = (
            f"voc/split{s}/base_model/model_final.pth"
        )
        for shot in (1, 2, 3, 5, 10):
            t[
                f"PascalVOC-detection/split{s}/faster_rcnn_R_101_FPN_ft_all{s}_{shot}shot_unfreeze.yaml"
            ] = f"voc/split{s}/FRCN+ft-full_{shot}shot/model_final.pth"
            t[
                f"PascalVOC-detection/split{s}/faster_rcnn_R_101_FPN_ft_all{s}_{shot}shot.yaml"
            ] = f"voc/split{s}/tfa_cos_{shot}shot/model_final.pth"
            t[
                f"PascalVOC-detection/split{s}/faster_rcnn_R_101_FPN_ft_fc_all{s}_{shot}shot.yaml"
            ] = f"voc/split{s}/tfa_fc_{shot}shot/model_final.pth"
    # COCO: base + TFA cos/fc x shots
    t["COCO-detection/faster_rcnn_R_101_FPN_base.yaml"] = "coco/base_model/model_final.pth"
    for shot in (1, 2, 3, 5, 10, 30):
        t[f"COCO-detection/faster_rcnn_R_101_FPN_ft_all_{shot}shot.yaml"] = (
            f"coco/tfa_cos_{shot}shot/model_final.pth"
        )
        t[f"COCO-detection/faster_rcnn_R_101_FPN_ft_fc_all_{shot}shot.yaml"] = (
            f"coco/tfa_fc_{shot}shot/model_final.pth"
        )
    # LVIS: base/fine-tuned x depth x cls head x repeat sampling
    for depth in (50, 101):
        for cos, cs in (("", "fc"), ("_cosine", "cos")):
            for rep, rs in (("", "repeat"), ("_norepeat", "norepeat")):
                t[f"LVIS-detection/faster_rcnn_R_{depth}_FPN_base{rep}{cos}.yaml".replace("base_cosine", "base_cosine")] = (
                    f"lvis/R_{depth}_FPN_base_{rs}_{cs}/model_final.pth"
                )
    return t

CONFIG_PATH_TO_URL_SUFFIX = _build_table()


def get_checkpoint_url(config_path: str) -> str:
    if config_path in CONFIG_PATH_TO_URL_SUFFIX:
        return URL_PREFIX + CONFIG_PATH_TO_URL_SUFFIX[config_path]
    raise RuntimeError(f"{config_path} not available in Model Zoo!")


def get_config_file(config_path: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cfg_file = os.path.join(root, "configs", config_path)
    if not os.path.exists(cfg_file):
        raise RuntimeError(f"{config_path} not available in Model Zoo!")
    return cfg_file


def get(config_path: str, trained: bool = False):
    """Build the model + TrainState for a zoo config; with trained=True the
    weights path must already be downloaded locally (zero-egress envs)."""
    import jax

    from lvc_tpu.checkpoint.checkpointer import DetectionCheckpointer
    from lvc_tpu.config import get_cfg
    from lvc_tpu.engine.train_loop import TrainState
    from lvc_tpu.modeling.meta_arch.build import build_model
    from lvc_tpu.solver.build import build_optimizer
    import __graft_entry__ as g

    cfg = get_cfg()
    cfg.merge_from_file(get_config_file(config_path))
    if trained:
        cfg.MODEL.WEIGHTS = get_checkpoint_url(config_path)
    model = build_model(cfg)
    batch = g._make_batch(B=1, H=256, W=256)
    variables = g.fast_init(model, {"params": jax.random.PRNGKey(0)}, batch, train=False)
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables, tx)
    if cfg.MODEL.WEIGHTS and os.path.isfile(cfg.MODEL.WEIGHTS):
        state = DetectionCheckpointer(state).load(cfg.MODEL.WEIGHTS, state)
    return model, state
