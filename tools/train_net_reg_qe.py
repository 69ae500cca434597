"""Box-correction inference over pseudo-annotation datasets.

Counterpart of reference tools/train_net_reg_qe.py: iterates
cfg.DATASETS.DT_PATH (instead of DATASETS.TEST), feeds each candidate
JSON's boxes through the cascade corrector
(GeneralizedRCNNRegOnly/CascadeROIHeads._forward_box_qe), and writes
``*_ubbr.json`` via UBBRSaver.
"""
from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from lvc_tpu.config import get_cfg, set_global_cfg
from lvc_tpu.data import builtin  # noqa: F401
from lvc_tpu.data.build import build_detection_test_loader
from lvc_tpu.data.utils import register_results
from lvc_tpu.engine.defaults import DefaultTrainer, default_argument_parser, default_setup
from lvc_tpu.evaluation.evaluator import inference_on_dataset
from lvc_tpu.evaluation.ubbr_saver import UBBRSaver


def setup(args):
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts)
    cfg.freeze()
    set_global_cfg(cfg)
    default_setup(cfg, args)
    return cfg


def main(args):
    cfg = setup(args)
    register_results(cfg)

    # correction runs the reg-only meta-arch regardless of the train config
    reg_cfg = cfg.clone().defrost()
    reg_cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNNRegOnly"
    reg_cfg.freeze()

    trainer = DefaultTrainer(reg_cfg, eval_only=True)
    trainer.resume_or_load(resume=args.resume)

    for results_file in cfg.DATASETS.DT_PATH:
        if not os.path.isfile(results_file):
            print(f"skipping missing {results_file}")
            continue
        # Every candidate box must flow through the corrector (the reference
        # iterates them all, train_net_reg_qe.py); the fixed-shape gt slots
        # would silently drop per-image overflow, so widen the pad to the
        # densest image in this file (rounded up for compile-cache stability).
        with open(results_file) as f:
            data = json.load(f)
        anns = data["annotations"] if isinstance(data, dict) else data
        # count every annotation: the with_gt loader keeps ignore_qe
        # regions as gt slots too, and the corrector emits all of them
        per_img = Counter(a["image_id"] for a in anns)
        need = max(per_img.values(), default=1)
        file_cfg = reg_cfg.clone().defrost()
        file_cfg.PAD.MAX_GT_PER_IMAGE = max(
            reg_cfg.PAD.MAX_GT_PER_IMAGE, -(-need // 16) * 16
        )
        file_cfg.freeze()
        loader = build_detection_test_loader(
            file_cfg, results_file, batch_size=max(len(jax.devices()), 1), with_gt=True
        )
        saver = UBBRSaver(results_file, reg_cfg)
        infer = lambda batch: trainer.eval_step(trainer.state, batch)
        inference_on_dataset(infer, loader, saver)


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
