"""Dataset inference loop.

Counterpart of lvc/evaluation/evaluator.py (inference_on_dataset:85-161):
eval-mode loop with warmup and pure-compute timing. Here the model is a
jitted apply function over padded batches; the evaluator consumes
(Detections, metas) pairs.
"""
from __future__ import annotations

import datetime
import logging
import time
from typing import Callable, List, Optional

import jax

logger = logging.getLogger(__name__)


class DatasetEvaluators:
    def __init__(self, evaluators: List):
        self._evaluators = evaluators

    def reset(self):
        for e in self._evaluators:
            e.reset()

    def process_detections(self, dets, metas):
        for e in self._evaluators:
            e.process_detections(dets, metas)

    def evaluate(self):
        results = {}
        for e in self._evaluators:
            r = e.evaluate()
            if r:
                for k, v in r.items():
                    assert k not in results, f"duplicate metric key {k}"
                    results[k] = v
        return results


def inference_on_dataset(infer_fn: Callable, data_loader, evaluator) -> dict:
    """infer_fn(batch) -> Detections (padded). Timing mirrors the
    reference: first iterations are warmup, compute time is measured
    separately from data time."""
    evaluator.reset()
    num_warmup = 2
    total_compute = 0.0
    start = time.perf_counter()
    n_images = 0
    for idx, (batch, metas) in enumerate(data_loader):
        t0 = time.perf_counter()
        dets = infer_fn(batch)
        dets = jax.block_until_ready(dets)
        t1 = time.perf_counter()
        if idx >= num_warmup:
            total_compute += t1 - t0
        evaluator.process_detections(dets, metas)
        n_images += sum(not m.get("padding") for m in metas)
    total = time.perf_counter() - start
    if n_images:
        logger.info(
            "Inference done on %d images. compute %.4f s/img, total %s",
            n_images,
            total_compute / max(n_images, 1),
            datetime.timedelta(seconds=int(total)),
        )
    results = evaluator.evaluate()
    return results if results is not None else {}
