"""UBBR box-corrector training + quality measurement.

Counterpart of reference tools/train_net_reg.py: trains the cascade
corrector (RBG proposals + CascadeROIHeads/BoxOnlyLayersCascade), and its
custom test() measures mean input-vs-output IoU per class
(process_outputs:70-91, test:94-193), writing inference/results_*.json.
The measurement candidates are RBG-jittered gt boxes (seeded), regressed
through the reg-only inference path.
"""
from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lvc_tpu.config import get_cfg, set_global_cfg
from lvc_tpu.data import builtin  # noqa: F401
from lvc_tpu.data.build import build_detection_test_loader
from lvc_tpu.engine.defaults import DefaultTrainer, default_argument_parser, default_setup
from lvc_tpu.structures import boxes as box_ops


def jitter_candidates(rng, gt_boxes, gt_valid, alpha=0.25, beta=0.3):
    """Seeded RBG-style jitter of gt boxes for IoU measurement."""
    x, y = gt_boxes[..., 0], gt_boxes[..., 1]
    w = gt_boxes[..., 2] - gt_boxes[..., 0]
    h = gt_boxes[..., 3] - gt_boxes[..., 1]
    tx = rng.uniform(-alpha, alpha, x.shape)
    ty = rng.uniform(-alpha, alpha, y.shape)
    tw = rng.uniform(np.log(1 - beta), np.log(1 + beta), w.shape)
    th = rng.uniform(np.log(1 - beta), np.log(1 + beta), h.shape)
    nx = x + w * tx
    ny = y + h * ty
    nw = w * np.exp(tw)
    nh = h * np.exp(th)
    out = np.stack([nx, ny, nx + nw, ny + nh], axis=-1).astype(np.float32)
    return np.where(gt_valid[..., None], out, gt_boxes)


class RegTrainer(DefaultTrainer):
    @classmethod
    def test(cls, cfg, state, eval_step=None, trainer_cls=None):
        """Per-class mean input/output IoU of the corrector."""
        from lvc_tpu.engine.train_loop import make_eval_step
        from lvc_tpu.modeling.meta_arch.build import build_model

        reg_cfg = cfg.clone().defrost()
        reg_cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNNRegOnly"
        reg_cfg.freeze()
        model = build_model(reg_cfg)
        step = make_eval_step(model)
        rng = np.random.RandomState(0)

        all_results = {}
        for dataset_name in cfg.DATASETS.TEST:
            loader = build_detection_test_loader(
                cfg, dataset_name, batch_size=max(len(jax.devices()), 1), with_gt=True
            )
            iou_in = defaultdict(list)
            iou_out = defaultdict(list)
            for batch, metas in loader:
                cands = jitter_candidates(rng, batch["gt_boxes"], batch["gt_valid"])
                b = dict(batch)
                gt_orig = batch["gt_boxes"]
                b["gt_boxes"] = jnp.asarray(cands)
                out = step(state, b)
                out = jax.tree_util.tree_map(np.asarray, out)
                for i, meta in enumerate(metas):
                    if meta.get("padding"):
                        continue
                    v = np.asarray(batch["gt_valid"][i]) & out.valid[i]
                    before = np.asarray(
                        box_ops.matched_pairwise_iou(cands[i], np.asarray(gt_orig[i]))
                    )
                    after = np.asarray(
                        box_ops.matched_pairwise_iou(out.boxes[i], np.asarray(gt_orig[i]))
                    )
                    cls = np.asarray(batch["gt_classes"][i])
                    for k in np.nonzero(v)[0]:
                        iou_in[int(cls[k])].append(float(before[k]))
                        iou_out[int(cls[k])].append(float(after[k]))
            per_class = {
                str(c): {
                    "iou_in": float(np.mean(iou_in[c])),
                    "iou_out": float(np.mean(iou_out[c])),
                    "n": len(iou_in[c]),
                }
                for c in sorted(iou_in)
            }
            mean_in = float(np.mean([v["iou_in"] for v in per_class.values()])) if per_class else 0.0
            mean_out = float(np.mean([v["iou_out"] for v in per_class.values()])) if per_class else 0.0
            results = {"per_class": per_class, "mean_iou_in": mean_in, "mean_iou_out": mean_out}
            print(f"[{dataset_name}] corrector IoU: in={mean_in:.4f} out={mean_out:.4f}")
            out_dir = os.path.join(cfg.OUTPUT_DIR, "inference")
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, f"results_{dataset_name.replace('/', '_')}.json"), "w") as f:
                json.dump(results, f)
            all_results[dataset_name] = {"ubbr": results}
        if len(all_results) == 1:
            return list(all_results.values())[0]
        return all_results


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
    trainer = RegTrainer(cfg, eval_only=args.eval_only)
    trainer.resume_or_load(resume=args.resume)
    if args.eval_only:
        return RegTrainer.test(cfg, trainer.state)
    return trainer.train()


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
