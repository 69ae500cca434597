"""Training tests: deterministic single-batch overfit + trainer smoke."""
import os

import numpy as np
import jax
import pytest

from lvc_tpu.config import get_cfg

from test_data_pipeline import synthetic_coco  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_step_overfits_single_batch():
    """Repeated SGD on one fixed batch must drive the loss down."""
    import __graft_entry__ as g
    from lvc_tpu.engine.train_loop import TrainState, make_train_step
    from lvc_tpu.modeling.meta_arch.build import build_model
    from lvc_tpu.solver.build import build_optimizer

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs/Base-RCNN-FPN.yaml"))
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.PIXEL_STD = [57.375, 57.12, 58.395]
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.BACKBONE.FREEZE_AT = 0
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = (100000,)

    model = build_model(cfg)
    # s2d=False: this test overrides PIXEL_STD, but the graft-entry s2d key
    # bakes in the default normalization
    batch = g._make_batch(B=1, H=128, W=128, train=True, seed=3, s2d=False)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch,
        train=True,
    )
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, tx))

    rng = jax.random.PRNGKey(7)
    losses = []
    for _ in range(15):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] < losses[0] * 0.9, losses


@pytest.mark.slow
def test_trainer_smoke(synthetic_coco, tmp_path):  # noqa: F811
    from lvc_tpu.engine.defaults import DefaultTrainer

    name, _ = synthetic_coco
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(REPO, "configs/Base-RCNN-FPN.yaml"))
    cfg.DATASETS.TRAIN = (name,)
    cfg.DATASETS.TEST = ()
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 128
    cfg.PAD.CANVAS_BUCKETS = [[128, 128]]
    cfg.PAD.MAX_GT_PER_IMAGE = 10
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 128
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.PIXEL_STD = [57.375, 57.12, 58.395]
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 6
    cfg.SOLVER.BASE_LR = 1e-4
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_TYPE = "norm"
    cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE = 1.0
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.CHECKPOINT_PERIOD = 100
    cfg.SOLVER.STEPS = (1000,)
    cfg.TEST.EVAL_PERIOD = 0
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.SEED = 0
    cfg.OUTPUT_DIR = str(tmp_path)

    trainer = DefaultTrainer(cfg)
    trainer.train()
    # all steps ran with finite losses (run_step raises on NaN)
    assert trainer.iter == 5
    assert os.path.exists(os.path.join(str(tmp_path), "metrics.json"))
    assert os.path.exists(os.path.join(str(tmp_path), "last_checkpoint"))
    # resume restores the step counter
    trainer2 = DefaultTrainer(cfg)
    trainer2.resume_or_load(resume=True)
    assert trainer2.start_iter == 6


def test_eval_only_trainer_skips_train_stack():
    """Eval-only construction must not touch TRAIN datasets or the train
    step (reference tools/train_net.py:115-123 builds only the model)."""
    from lvc_tpu.config import get_cfg
    from lvc_tpu.engine.defaults import DefaultTrainer

    cfg = get_cfg()
    cfg.merge_from_file("configs/Base-RCNN-FPN.yaml")
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    cfg.PAD.CANVAS_BUCKETS = [[64, 64]]
    cfg.DATASETS.TRAIN = ("this_dataset_does_not_exist",)
    cfg.OUTPUT_DIR = "/tmp/lvc_tpu_test_evalonly"
    t = DefaultTrainer(cfg, eval_only=True)
    assert t.data_loader is None
    assert t.state is not None and t.eval_step is not None
    # state is loadable / checkpointer exists
    assert t.checkpointer is not None
