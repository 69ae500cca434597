"""Default trainer, predictor, argument parser, setup.

Counterpart of lvc/engine/defaults.py (default_argument_parser:63,
default_setup:148, DefaultPredictor:206, DefaultTrainer:269). TPU-first:
the trainer owns a jitted data-parallel train step over a
``jax.sharding.Mesh`` instead of DDP-wrapped modules and mp.spawn — one
process drives all local devices.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Dict, List, Optional

import jax
import numpy as np
from jax.sharding import Mesh

from lvc_tpu.checkpoint.checkpointer import DetectionCheckpointer
from lvc_tpu.config import CfgNode, set_global_cfg
from lvc_tpu.data.build import build_detection_test_loader, build_detection_train_loader
from lvc_tpu.data.catalog import MetadataCatalog
from lvc_tpu.engine import hooks as hooks_mod
from lvc_tpu.engine.train_loop import (
    TrainState,
    make_data_parallel_train_step,
    make_eval_step,
    make_eval_step_auto,
    shard_batch,
)
from lvc_tpu.evaluation.coco_evaluation import COCOEvaluator
from lvc_tpu.evaluation.evaluator import inference_on_dataset
from lvc_tpu.evaluation.testing import print_csv_format, verify_results
from lvc_tpu.modeling.meta_arch.build import build_model
from lvc_tpu.solver.build import build_lr_schedule, build_optimizer
from lvc_tpu.utils.events import (
    CommonMetricPrinter,
    EventStorage,
    JSONWriter,
    TensorboardWriter,
)

logger = logging.getLogger("lvc_tpu")


def default_argument_parser():
    """Same flags as the reference (lvc/engine/defaults.py:63-145); the
    distributed flags are accepted for CLI compatibility but a single
    process drives all local TPU devices."""
    parser = argparse.ArgumentParser(description="LVC-TPU training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("--eval-all", action="store_true")
    parser.add_argument("--eval-during-train", action="store_true")
    parser.add_argument("--eval-iter", type=int, default=-1)
    parser.add_argument("--start-iter", type=int, default=-1)
    parser.add_argument("--end-iter", type=int, default=-1)
    parser.add_argument("--num-gpus", type=int, default=1, help="(compat) ignored; jax uses all local devices")
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default="auto")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser


def default_setup(cfg: CfgNode, args):
    output_dir = cfg.OUTPUT_DIR
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
        stream=sys.stdout,
        force=False,
    )
    logger.info("Command line args: %s", args)
    logger.info("Devices: %s", jax.devices())
    if output_dir:
        path = os.path.join(output_dir, "config.yaml")
        with open(path, "w") as f:
            f.write(cfg.dump())
        logger.info("Full config saved to %s", path)
    seed = cfg.SEED if cfg.SEED >= 0 else int.from_bytes(os.urandom(4), "little")
    np.random.seed(seed)
    return seed


class DefaultTrainer:
    """Builds model/loader/optimizer/state, runs the hook loop.

    Mirrors the reference DefaultTrainer surface (train/test/build_*)
    with a jit train step over the local-device mesh.
    """

    def __init__(self, cfg: CfgNode, eval_only: bool = False):
        self.cfg = cfg
        set_global_cfg(cfg)
        self.model = self.build_model(cfg)
        devices = jax.devices()
        # data-parallel axis must divide the global batch
        n = len(devices)
        while cfg.SOLVER.IMS_PER_BATCH % n:
            n -= 1
        self.mesh = Mesh(np.array(devices[:n]), axis_names=("data",))
        self.n_devices = n

        if eval_only:
            # eval-only fast path (reference tools/train_net.py:115-123
            # builds only the model): no train loader, no train step, no
            # hooks; params come from the checkpoint via resume_or_load
            seed = max(cfg.SEED, 0)
            h, w = cfg.PAD.CANVAS_BUCKETS[0]
            G = cfg.PAD.MAX_GT_PER_IMAGE
            example = {
                "image": jax.numpy.zeros((1, h, w, 3), jax.numpy.float32),
                "image_size": jax.numpy.asarray([[h, w]], np.int32),
                # gt slots: box-correction archs (GeneralizedRCNNRegOnly)
                # consume candidates through them even at inference
                "gt_boxes": jax.numpy.zeros((1, G, 4), jax.numpy.float32),
                "gt_classes": jax.numpy.zeros((1, G), jax.numpy.int32),
                "gt_valid": jax.numpy.zeros((1, G), bool),
            }
            variables = jax.eval_shape(
                lambda: self.model.init(
                    {"params": jax.random.PRNGKey(seed)}, example, train=False
                )
            )
            variables = self._materialize(variables, seed)
            self.tx = self.build_optimizer(cfg, variables["params"])
            self.state = TrainState.create(variables, self.tx)
            self.eval_step = make_eval_step_auto(
                self.model, devices=self.mesh.devices.flatten()
            )
            self.checkpointer = DetectionCheckpointer(self.state, cfg.OUTPUT_DIR)
            self.start_iter = 0
            self.max_iter = cfg.SOLVER.MAX_ITER
            self.storage = None
            self.iter = 0
            self._rng = jax.random.PRNGKey(seed)
            self._hooks = []
            self.data_loader = None
            self._loader_iter = None
            self._first_batch = None
            return

        self.data_loader = self.build_train_loader(cfg)
        self._loader_iter = iter(self.data_loader)

        # init variables from one real batch
        seed = max(cfg.SEED, 0)
        example = next(self._loader_iter)
        variables = jax.eval_shape(
            lambda: self.model.init(
                {"params": jax.random.PRNGKey(seed), "sampling": jax.random.PRNGKey(seed + 1)},
                example,
                train=True,
            )
        )
        variables = self._materialize(variables, seed)
        self.tx = self.build_optimizer(cfg, variables["params"])
        self.state = TrainState.create(variables, self.tx)
        self._first_batch = example

        self.schedule = build_lr_schedule(cfg)
        self.train_step = make_data_parallel_train_step(
            self.model, self.tx, self.mesh,
            mixed_precision=cfg.SOLVER.AMP.ENABLED,
        )
        self.eval_step = make_eval_step_auto(
            self.model, devices=self.mesh.devices.flatten()
        )

        self.checkpointer = DetectionCheckpointer(self.state, cfg.OUTPUT_DIR)
        self.start_iter = 0
        self.max_iter = cfg.SOLVER.MAX_ITER
        self.storage: Optional[EventStorage] = None
        self.iter = 0
        self._rng = jax.random.PRNGKey(seed)
        self._hooks: List[hooks_mod.HookBase] = []
        self.register_hooks(self.build_hooks())

    def _materialize(self, shapes, seed: int):
        """Proper random init without compiling the full init program:
        initializers applied leaf-wise host-side (utils/init.py)."""
        from lvc_tpu.utils.init import materialize_variables

        return materialize_variables(shapes, seed, conv_init="he")

    # ----------------------------------------------------------- factories
    @classmethod
    def build_model(cls, cfg):
        return build_model(cfg)

    @classmethod
    def build_optimizer(cls, cfg, params):
        return build_optimizer(cfg, params)

    @classmethod
    def build_train_loader(cls, cfg):
        # multi-host: every process loads only its shard (reference strides
        # samplers by torch.distributed rank, distributed_sampler.py:12-55)
        return build_detection_train_loader(
            cfg, rank=jax.process_index(), world_size=jax.process_count()
        )

    @classmethod
    def build_test_loader(cls, cfg, dataset_name):
        return build_detection_test_loader(
            cfg,
            dataset_name,
            batch_size=max(len(jax.local_devices()), 1),
            rank=jax.process_index(),
            world_size=jax.process_count(),
        )

    @classmethod
    def build_evaluator(cls, cfg, dataset_name):
        return COCOEvaluator(dataset_name, cfg, output_dir=os.path.join(cfg.OUTPUT_DIR, "inference"))

    def build_hooks(self) -> List[hooks_mod.HookBase]:
        cfg = self.cfg
        ret: List[hooks_mod.HookBase] = [
            hooks_mod.IterationTimer(),
            hooks_mod.LRSchedulerHook(build_lr_schedule(cfg)),
        ]
        if cfg.TEST.PRECISE_BN.ENABLED:
            ret.append(
                hooks_mod.PreciseBN(
                    cfg.TEST.EVAL_PERIOD,
                    self.model,
                    self._loader_iter,
                    cfg.TEST.PRECISE_BN.NUM_ITER,
                )
            )
        ret += [
            hooks_mod.PeriodicCheckpointerHook(
                self.checkpointer, cfg.SOLVER.CHECKPOINT_PERIOD, cfg.SOLVER.MAX_ITER
            ),
            hooks_mod.EvalHookFsdet(cfg.TEST.EVAL_PERIOD, self.test_with_self, cfg),
            hooks_mod.PeriodicWriter(self.build_writers(), period=20),
        ]
        return ret

    def build_writers(self):
        return [
            CommonMetricPrinter(self.max_iter),
            JSONWriter(os.path.join(self.cfg.OUTPUT_DIR, "metrics.json")),
            TensorboardWriter(self.cfg.OUTPUT_DIR),
        ]

    def register_hooks(self, hooks):
        for h in hooks:
            h.trainer = self
        self._hooks.extend(hooks)

    # ------------------------------------------------------------ training
    def resume_or_load(self, resume: bool = True):
        self.state, resumed = self.checkpointer.resume_or_load(
            self.cfg.MODEL.WEIGHTS, self.state, resume
        )
        if resumed:
            self.start_iter = int(self.state.step)
        return resumed

    def run_step(self):
        batch = self._first_batch if self._first_batch is not None else next(self._loader_iter)
        self._first_batch = None
        with self.mesh:
            sharded = shard_batch(batch, self.mesh)
            self.state, metrics = self.train_step(self.state, sharded, self._rng)
        metrics = {k: float(v) for k, v in metrics.items()}
        if not np.isfinite(metrics["total_loss"]):
            raise FloatingPointError(
                f"Loss became infinite or NaN at iteration={self.iter}! metrics={metrics}"
            )
        self.storage.put_scalars(**metrics)

    def train(self):
        logger.info("Starting training from iteration %d", self.start_iter)
        with EventStorage(self.start_iter) as self.storage:
            try:
                for h in self._hooks:
                    h.before_train()
                for self.iter in range(self.start_iter, self.max_iter):
                    self.storage.iter = self.iter
                    for h in self._hooks:
                        h.before_step()
                    self.run_step()
                    for h in self._hooks:
                        h.after_step()
            finally:
                for h in self._hooks:
                    h.after_train()
        if hasattr(self, "last_eval_results") and self.cfg.TEST.EXPECTED_RESULTS:
            verify_results(self.cfg, self.last_eval_results)
        return getattr(self, "last_eval_results", None)

    # ----------------------------------------------------------- evaluation
    def test_with_self(self):
        return self.test(self.cfg, self.state, self.eval_step, type(self))

    @classmethod
    def test(cls, cfg, state, eval_step=None, trainer_cls=None):
        trainer_cls = trainer_cls or cls
        if eval_step is None:
            model = trainer_cls.build_model(cfg)
            eval_step = make_eval_step_auto(model)
        results = {}
        for dataset_name in cfg.DATASETS.TEST:
            loader = trainer_cls.build_test_loader(cfg, dataset_name)
            evaluator = trainer_cls.build_evaluator(cfg, dataset_name)
            infer = lambda batch: eval_step(state, batch)
            results_i = inference_on_dataset(infer, loader, evaluator)
            results[dataset_name] = results_i
            print_csv_format(results_i)
        if len(results) == 1:
            results = list(results.values())[0]
        return results


class DefaultPredictor:
    """Single-image inference with the cfg's test transforms
    (lvc defaults.py:206-266)."""

    def __init__(self, cfg: CfgNode, state: Optional[TrainState] = None):
        self.cfg = cfg.clone()
        self.model = build_model(cfg)
        from lvc_tpu.data.dataset_mapper import DatasetMapper

        self.mapper = DatasetMapper(cfg, is_train=False)
        if state is None:
            variables_shapes = None  # filled on first call
            self.state = None
        else:
            self.state = state
        self._eval_step = None

    def _ensure_state(self, batch):
        if self.state is None:
            from lvc_tpu.utils.init import materialize_variables

            variables = jax.eval_shape(
                lambda: self.model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)
            )
            variables = materialize_variables(variables, seed=0, conv_init="he")
            tx = build_optimizer(self.cfg, variables["params"])
            self.state = TrainState.create(variables, tx)
            if self.cfg.MODEL.WEIGHTS:
                ckpt = DetectionCheckpointer(self.state)
                self.state = ckpt.load(self.cfg.MODEL.WEIGHTS, self.state)
        if self._eval_step is None:
            self._eval_step = make_eval_step(self.model)

    def __call__(self, image_bgr: np.ndarray):
        ex = self._map_array(image_bgr)
        key = "image_s2d" if "image_s2d" in ex else "image"
        batch = {
            key: ex[key][None],
            "image_size": ex["image_size"][None],
        }
        self._ensure_state(batch)
        dets = self._eval_step(self.state, batch)
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[0], dets)

    def _map_array(self, image: np.ndarray):
        from lvc_tpu.data import transforms as T
        from lvc_tpu.data.dataset_mapper import pick_canvas, wants_loader_s2d

        img, _, _ = T.resize_shortest_edge(
            image, None, self.cfg.INPUT.MIN_SIZE_TEST, self.cfg.INPUT.MAX_SIZE_TEST
        )
        h, w = img.shape[:2]
        ch, cw = pick_canvas(h, w, [tuple(b) for b in self.cfg.PAD.CANVAS_BUCKETS])
        size = np.array([h, w], np.int32)
        if wants_loader_s2d(self.cfg):
            s2d = T.s2d_canvas(
                img, (ch, cw), self.cfg.MODEL.PIXEL_MEAN, self.cfg.MODEL.PIXEL_STD
            )
            return {"image_s2d": s2d, "image_size": size}
        padded = np.zeros((ch, cw, 3), np.float32)
        padded[:h, :w] = img
        return {"image": padded, "image_size": size}
