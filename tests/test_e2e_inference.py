"""Full inference slice: loader -> jitted model -> evaluator -> metrics."""
import pytest

# full-model compiles: deselect with -m "not slow"
pytestmark = pytest.mark.slow

import numpy as np
import jax

from lvc_tpu.data.build import TestLoader, get_detection_dataset_dicts
from lvc_tpu.data.dataset_mapper import DatasetMapper
from lvc_tpu.evaluation.coco_evaluation import COCOEvaluator
from lvc_tpu.evaluation.evaluator import inference_on_dataset
from lvc_tpu.evaluation.testing import flatten_results_dict, print_csv_format
from lvc_tpu.modeling.meta_arch.build import build_model

from test_data_pipeline import small_cfg, synthetic_coco  # noqa: F401


def test_inference_on_dataset(synthetic_coco):  # noqa: F811
    name, _ = synthetic_coco
    cfg = small_cfg()
    cfg.merge_from_file("configs/Base-RCNN-FPN.yaml")
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.PAD.CANVAS_BUCKETS = [[128, 128]]
    cfg.PAD.MAX_GT_PER_IMAGE = 10
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 100
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 50
    cfg.TEST.DETECTIONS_PER_IMAGE = 10

    model = build_model(cfg)
    dicts = get_detection_dataset_dicts([name], filter_empty=False)
    mapper = DatasetMapper(cfg, is_train=False)
    loader = TestLoader(dicts, mapper, batch_size=2)

    example_batch, _ = next(iter(loader))
    variables = model.init({"params": jax.random.PRNGKey(0)}, example_batch, train=False)

    @jax.jit
    def infer(batch):
        return model.apply(variables, batch, train=False)

    evaluator = COCOEvaluator(name, cfg)
    results = inference_on_dataset(infer, loader, evaluator)
    assert "bbox" in results
    assert "AP" in results["bbox"]
    # random weights: AP is a number (very likely ~0), not a crash
    assert np.isfinite(results["bbox"]["AP"]) or results["bbox"]["AP"] == -1
    flat = flatten_results_dict(results)
    assert any(k.startswith("bbox/") for k in flat)
    print_csv_format(results)
