"""Trainer hooks.

Counterpart of detectron2/engine/hooks.py (IterationTimer:75,
PeriodicWriter:146, PeriodicCheckpointer:177, LRScheduler:196, EvalHook:300)
and lvc/engine/hooks.py (EvalHookFsdet:16 with flattened-scalar storage and
inference/res_final.json dumps).
"""
from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Optional

from lvc_tpu.evaluation.testing import flatten_results_dict

logger = logging.getLogger(__name__)


class HookBase:
    trainer = None  # set by the trainer

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass


class IterationTimer(HookBase):
    def __init__(self, warmup_iter: int = 3):
        self._warmup_iter = warmup_iter
        self._start_time = None
        self._step_start = None

    def before_train(self):
        self._start_time = time.perf_counter()

    def before_step(self):
        self._step_start = time.perf_counter()

    def after_step(self):
        dt = time.perf_counter() - self._step_start
        if self.trainer.iter - self.trainer.start_iter >= self._warmup_iter:
            self.trainer.storage.put_scalar("time", dt)

    def after_train(self):
        total = time.perf_counter() - self._start_time
        n = max(self.trainer.iter - self.trainer.start_iter, 1)
        logger.info("Total training time: %.1fs (%.4f s/it over %d iters)", total, total / n, n)


class LRSchedulerHook(HookBase):
    """Logs the scheduled lr each step (the schedule itself lives inside the
    optax chain)."""

    def __init__(self, schedule: Callable):
        self._schedule = schedule

    def after_step(self):
        lr = float(self._schedule(self.trainer.iter))
        self.trainer.storage.put_scalar("lr", lr, smoothing_hint=False)


class PeriodicCheckpointerHook(HookBase):
    def __init__(self, checkpointer, period: int, max_iter: int):
        self._checkpointer = checkpointer
        self._period = period
        self._max_iter = max_iter

    def after_step(self):
        it = self.trainer.iter
        if (it + 1) % self._period == 0 or (it + 1) >= self._max_iter:
            self._checkpointer.save(f"model_{it:07d}", self.trainer.state)


class PeriodicWriter(HookBase):
    def __init__(self, writers, period: int = 20):
        self._writers = writers
        self._period = period

    def after_step(self):
        if (self.trainer.iter + 1) % self._period == 0 or (
            self.trainer.iter + 1
        ) >= self.trainer.max_iter:
            for w in self._writers:
                w.write(self.trainer.storage)

    def after_train(self):
        for w in self._writers:
            w.write(self.trainer.storage)
            w.close()


class ProfilerHook(HookBase):
    """TPU trace capture over a step window (counterpart of the reference's
    AutogradProfiler hook, d2 hooks.py:236-297): writes a Perfetto/
    TensorBoard-viewable trace via jax.profiler."""

    def __init__(self, start_iter: int, end_iter: int, output_dir: str):
        self._start = start_iter
        self._end = end_iter
        self._dir = os.path.join(output_dir, "profiler")
        self._active = False

    def before_step(self):
        import jax

        if self.trainer.iter == self._start:
            os.makedirs(self._dir, exist_ok=True)
            jax.profiler.start_trace(self._dir)
            self._active = True

    def after_step(self):
        import jax

        if self._active and self.trainer.iter >= self._end:
            jax.profiler.stop_trace()
            self._active = False
            logger.info("Saved profiler trace to %s", self._dir)

    def after_train(self):
        import jax

        if self._active:
            jax.profiler.stop_trace()
            self._active = False


def update_bn_stats(model, state, batches, momentum: float = 0.9):
    """Recompute BatchNorm running statistics as the plain average of the
    batch moments over ``batches`` (the reference's PreciseBN,
    d2 hooks.py:357 / fvcore update_bn_stats).

    Functional-style: each apply with ``mutable=['batch_stats']`` returns
    the EMA-updated stats; the raw per-batch moment is recovered by
    inverting the EMA (new = m*old + (1-m)*batch), then all raw moments are
    averaged. Returns a new TrainState with the refreshed stats.
    """
    import jax
    import jax.numpy as jnp

    old = state.batch_stats
    acc = None
    n = 0
    rng = jax.random.PRNGKey(0)
    for batch in batches:
        rng, sub = jax.random.split(rng)
        _, mutated = model.apply(
            {"params": state.params, "batch_stats": old},
            batch,
            train=True,
            mutable=["batch_stats"],
            rngs={"sampling": sub, "dropout": sub},
        )
        new = mutated["batch_stats"]
        raw = jax.tree_util.tree_map(
            lambda nw, od: (nw - momentum * od) / (1.0 - momentum), new, old
        )
        acc = raw if acc is None else jax.tree_util.tree_map(jnp.add, acc, raw)
        n += 1
    if n == 0:
        return state
    avg = jax.tree_util.tree_map(lambda a: a / n, acc)
    return state.replace(batch_stats=avg)


class PreciseBN(HookBase):
    """Refresh BN running stats from NUM_ITER train batches before each
    eval (d2 hooks.py:357-426). No-op when the model has no mutable BN."""

    def __init__(self, period: int, model, data_iter, num_iter: int = 200):
        self._period = period
        self._model = model
        self._data_iter = data_iter
        self._num_iter = num_iter

    def _has_bn(self):
        stats = self.trainer.state.batch_stats
        import jax

        return len(jax.tree_util.tree_leaves(stats)) > 0

    def _run(self):
        if not self._has_bn():
            return
        batches = (next(self._data_iter) for _ in range(self._num_iter))
        self.trainer.state = update_bn_stats(self._model, self.trainer.state, batches)
        logger.info("PreciseBN: refreshed batch_stats over %d batches", self._num_iter)

    def after_step(self):
        it = self.trainer.iter + 1
        if self._period > 0 and (it % self._period == 0 or it >= self.trainer.max_iter):
            self._run()


class EvalHookFsdet(HookBase):
    """Periodic eval; flattens result scalars into storage and json-dumps
    the final results (lvc hooks.py:16-84)."""

    def __init__(self, eval_period: int, eval_fn: Callable, cfg):
        self._period = eval_period
        self._fn = eval_fn
        self._cfg = cfg

    def _do_eval(self, final: bool):
        results = self._fn()
        if results:
            flat = flatten_results_dict(results)
            for k, v in flat.items():
                try:
                    self.trainer.storage.put_scalar(k, float(v), smoothing_hint=False)
                except (TypeError, ValueError):
                    pass
            out_dir = os.path.join(self._cfg.OUTPUT_DIR, "inference")
            os.makedirs(out_dir, exist_ok=True)
            name = "res_final.json" if final else f"iter_{self.trainer.iter:07d}.json"
            with open(os.path.join(out_dir, name), "w") as f:
                json.dump(results, f)
        return results

    def after_step(self):
        if self._period > 0 and (self.trainer.iter + 1) % self._period == 0:
            if (self.trainer.iter + 1) < self.trainer.max_iter:
                self._do_eval(final=False)

    def after_train(self):
        self.trainer.last_eval_results = self._do_eval(final=True)
