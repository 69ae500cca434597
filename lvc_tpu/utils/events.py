"""Metrics storage and writers.

Counterpart of detectron2/utils/events.py (EventStorage:232, JSONWriter:40,
CommonMetricPrinter:154, TensorboardXWriter:109).
"""
from __future__ import annotations

import datetime
import json
import logging
import os
import time
from collections import defaultdict, deque
from contextlib import contextmanager
from typing import Dict, Optional

logger = logging.getLogger(__name__)

_CURRENT_STORAGE_STACK = []


def get_event_storage() -> "EventStorage":
    assert _CURRENT_STORAGE_STACK, "get_event_storage() called outside a storage context"
    return _CURRENT_STORAGE_STACK[-1]


class HistoryBuffer:
    def __init__(self, window: int = 20):
        self._deque = deque(maxlen=window)
        self._total = 0.0
        self._count = 0
        self._latest = float("nan")

    def update(self, value: float):
        self._deque.append(value)
        self._total += value
        self._count += 1
        self._latest = value

    def latest(self) -> float:
        return self._latest

    def median(self) -> float:
        import statistics

        return statistics.median(self._deque) if self._deque else float("nan")

    def avg(self) -> float:
        return sum(self._deque) / len(self._deque) if self._deque else float("nan")

    def global_avg(self) -> float:
        return self._total / max(self._count, 1)


class EventStorage:
    def __init__(self, start_iter: int = 0):
        self._history: Dict[str, HistoryBuffer] = defaultdict(HistoryBuffer)
        self._smoothing_hints: Dict[str, bool] = {}
        self._iter = start_iter
        self._name_scope = ""
        self._vis_data = []
        self._histograms = []

    @property
    def iter(self) -> int:
        return self._iter

    @iter.setter
    def iter(self, value: int):
        self._iter = value

    def step(self):
        self._iter += 1

    def put_scalar(self, name: str, value, smoothing_hint: bool = True):
        name = self._name_scope + name
        self._history[name].update(float(value))
        self._smoothing_hints[name] = smoothing_hint

    def put_scalars(self, *, smoothing_hint: bool = True, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v, smoothing_hint=smoothing_hint)

    def histories(self) -> Dict[str, HistoryBuffer]:
        return self._history

    def latest_with_smoothing(self) -> Dict[str, float]:
        out = {}
        for k, h in self._history.items():
            out[k] = h.median() if self._smoothing_hints.get(k, True) else h.latest()
        return out

    def put_image(self, img_name: str, img_tensor):
        """Queue an image for writers that support it (events.py:put_image).
        img_tensor: (H, W, 3) uint8/float in [0, 255]."""
        self._vis_data.append((img_name, img_tensor, self.iter))

    def put_histogram(self, hist_name: str, values, bins: int = 1000):
        """Queue a histogram of ``values`` (events.py:put_histogram)."""
        import numpy as np

        values = np.asarray(values).reshape(-1)
        counts, edges = np.histogram(values, bins=min(bins, max(len(values), 1)))
        self._histograms.append(
            dict(name=hist_name, counts=counts, edges=edges, iter=self.iter)
        )

    def clear_images(self):
        self._vis_data = []

    def clear_histograms(self):
        self._histograms = []

    @property
    def vis_data(self):
        return self._vis_data

    @property
    def histograms(self):
        return self._histograms

    @contextmanager
    def name_scope(self, name: str):
        old = self._name_scope
        self._name_scope = old + name + "/"
        try:
            yield
        finally:
            self._name_scope = old

    def __enter__(self):
        _CURRENT_STORAGE_STACK.append(self)
        return self

    def __exit__(self, *args):
        assert _CURRENT_STORAGE_STACK[-1] is self
        _CURRENT_STORAGE_STACK.pop()


class JSONWriter:
    """Appends one json line of latest scalars per write (metrics.json)."""

    def __init__(self, json_file: str, window_size: int = 20):
        os.makedirs(os.path.dirname(json_file) or ".", exist_ok=True)
        self._file = open(json_file, "a")

    def write(self, storage: EventStorage):
        row = {"iteration": storage.iter}
        row.update(storage.latest_with_smoothing())
        self._file.write(json.dumps(row, sort_keys=True) + "\n")
        self._file.flush()

    def close(self):
        self._file.close()


class CommonMetricPrinter:
    """The terminal line: eta, iter, losses, lr (events.py:154)."""

    def __init__(self, max_iter: int):
        self._max_iter = max_iter
        self._last_write: Optional[tuple] = None

    def write(self, storage: EventStorage):
        iteration = storage.iter
        latest = storage.latest_with_smoothing()
        data_time = latest.get("data_time")
        step_time = latest.get("time")
        eta = ""
        if step_time:
            secs = step_time * (self._max_iter - iteration)
            eta = f"eta: {datetime.timedelta(seconds=int(secs))}  "
        losses = "  ".join(
            f"{k}: {v:.4g}" for k, v in latest.items() if "loss" in k
        )
        lr = latest.get("lr")
        lr_s = f"lr: {lr:.3e}  " if lr is not None else ""
        t_s = f"time: {step_time:.4f}  " if step_time else ""
        d_s = f"data_time: {data_time:.4f}  " if data_time else ""
        logger.info(f"{eta}iter: {iteration}  {losses}  {t_s}{d_s}{lr_s}")

    def close(self):
        pass


class TensorboardWriter:
    """Optional tensorboard writer; silently disabled if unavailable."""

    def __init__(self, log_dir: str, window_size: int = 20):
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(log_dir)
        except Exception:
            logger.info("tensorboard unavailable; skipping TensorboardWriter")

    def write(self, storage: EventStorage):
        if self._writer is None:
            return
        for k, v in storage.latest_with_smoothing().items():
            self._writer.add_scalar(k, v, storage.iter)

    def close(self):
        if self._writer is not None:
            self._writer.close()
