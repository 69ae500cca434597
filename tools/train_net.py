"""Main training/eval CLI (counterpart of reference tools/train_net.py).

Handles base training, fine-tuning stages, eval-only runs, and (with
MODEL.META_ARCHITECTURE "ProposalNetwork") proposal extraction.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lvc_tpu.config import get_cfg, set_global_cfg
from lvc_tpu.data import builtin  # noqa: F401  (registers datasets at import)
from lvc_tpu.engine.defaults import DefaultTrainer, default_argument_parser, default_setup
from lvc_tpu.evaluation.coco_evaluation import COCOEvaluator
from lvc_tpu.evaluation.testing import verify_results


class Trainer(DefaultTrainer):
    @classmethod
    def build_evaluator(cls, cfg, dataset_name):
        if cfg.MODEL.META_ARCHITECTURE == "ProposalNetwork":
            from lvc_tpu.evaluation.rpn_evaluation import RPNEvaluator

            return RPNEvaluator(dataset_name, cfg, output_dir=cfg.OUTPUT_DIR)
        from lvc_tpu.data.catalog import MetadataCatalog

        ev_type = MetadataCatalog.get(dataset_name).get("evaluator_type", "coco")
        if ev_type == "coco":
            return COCOEvaluator(
                dataset_name, cfg, output_dir=os.path.join(cfg.OUTPUT_DIR, "inference")
            )
        if ev_type == "pascal_voc":
            from lvc_tpu.evaluation.pascal_voc_evaluation import PascalVOCDetectionEvaluator

            return PascalVOCDetectionEvaluator(dataset_name)
        if ev_type == "lvis":
            from lvc_tpu.evaluation.lvis_evaluation import LVISEvaluator

            return LVISEvaluator(
                dataset_name, cfg, output_dir=os.path.join(cfg.OUTPUT_DIR, "inference")
            )
        raise NotImplementedError(f"no evaluator for type {ev_type}")


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

    if args.eval_only:
        trainer = Trainer(cfg, eval_only=True)
        trainer.resume_or_load(resume=args.resume)
        res = Trainer.test(cfg, trainer.state, trainer.eval_step, Trainer)
        if cfg.TEST.EXPECTED_RESULTS:
            verify_results(cfg, res)
        return res

    trainer = Trainer(cfg)
    trainer.resume_or_load(resume=args.resume)
    return trainer.train()


if __name__ == "__main__":
    args = default_argument_parser().parse_args()
    main(args)
