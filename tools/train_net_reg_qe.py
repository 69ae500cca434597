"""Box-correction inference over pseudo-annotation datasets.

Counterpart of reference tools/train_net_reg_qe.py: iterates
cfg.DATASETS.DT_PATH (instead of DATASETS.TEST), feeds each candidate
JSON's boxes through the cascade corrector
(GeneralizedRCNNRegOnly/CascadeROIHeads._forward_box_qe), and writes
``*_ubbr.json`` via UBBRSaver.
"""
from __future__ import annotations

import os
import sys

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
        loader = build_detection_test_loader(
            reg_cfg, results_file, batch_size=max(len(jax.devices()), 1), with_gt=True
        )
        saver = UBBRSaver(results_file, reg_cfg)
        infer = lambda batch: trainer.eval_step(trainer.state, batch)
        inference_on_dataset(infer, loader, saver)


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
