"""End-to-end retraining on pseudo-annotations with ignore regions.

Counterpart of reference tools/train_net_qe_ig.py — which ships broken
(imports the renamed ``fsdet.*`` package, reference :17-18). This is the
working equivalent: a trainer whose train loader keeps ignore regions
(DatasetMapperIgnore semantics) and merges the QUERY_EXPAND pseudo
datasets (the loader-side merge of lvc/data/build.py:140-154).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvc_tpu.config import get_cfg, set_global_cfg
from lvc_tpu.data import builtin  # noqa: F401
from lvc_tpu.data.build import build_detection_train_loader
from lvc_tpu.data.dataset_mapper import DatasetMapper
from lvc_tpu.data.utils import register_results
from lvc_tpu.engine.defaults import DefaultTrainer, default_argument_parser, default_setup
from lvc_tpu.evaluation.testing import verify_results


class TrainerQEIgnore(DefaultTrainer):
    @classmethod
    def build_train_loader(cls, cfg):
        mapper = DatasetMapper(cfg, is_train=True, keep_ignore=True, seed=max(cfg.SEED, 0))
        return build_detection_train_loader(cfg, mapper=mapper)

    @classmethod
    def build_optimizer(cls, cfg, params):
        # CLIP-style (ResNet-D) backbones finetune at SOLVER.CLIP_LR
        # (reference train_net_qe_ig.py:51-117 build_clip_optimizer)
        if cfg.MODEL.RESNETS.D:
            from lvc_tpu.solver.build import build_clip_optimizer

            return build_clip_optimizer(cfg, params)
        return super().build_optimizer(cfg, params)


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
    if cfg.QUERY_EXPAND.ENABLED:
        register_results(cfg)

    if args.eval_only:
        trainer = TrainerQEIgnore(cfg)
        trainer.resume_or_load(resume=args.resume)
        res = TrainerQEIgnore.test(cfg, trainer.state, trainer.eval_step, TrainerQEIgnore)
        if cfg.TEST.EXPECTED_RESULTS:
            verify_results(cfg, res)
        return res

    trainer = TrainerQEIgnore(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
