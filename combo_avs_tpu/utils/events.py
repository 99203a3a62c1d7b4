"""Event storage and metric writers (detectron2 EventStorage equivalents).

The reference inherits d2's EventStorage + writers (SURVEY §5): scalars are
accumulated per iteration, smoothed over a window for display, and flushed by
a JSON writer and a TensorBoard writer. This module supplies the same
surface, TPU-repo sized:

* `EventStorage.put_scalar(s)` — record scalars at the current iteration;
  `median(window)` / `latest()` match d2's smoothing hooks
  (d2 events.py EventStorage; consumed by the reference's BestCheckpointer
  via storage.latest(), ref: models/engine/hooks.py:63).
* `JSONWriter` — one JSON dict per line with "iteration", d2's
  metrics.json format.
* `TensorBoardWriter` — torch.utils.tensorboard SummaryWriter, import-gated.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict, deque
from typing import Dict, Optional


class EventStorage:
    def __init__(self, start_iter: int = 0, window_size: int = 20):
        self.iter = start_iter
        self._window = window_size
        self._history: Dict[str, deque] = defaultdict(
            lambda: deque(maxlen=max(window_size, 1))
        )
        self._latest: Dict[str, tuple] = {}  # name -> (value, iter)

    def put_scalar(self, name: str, value) -> None:
        value = float(value)
        self._history[name].append(value)
        self._latest[name] = (value, self.iter)

    def put_scalars(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.put_scalar(k, v)

    def latest(self) -> Dict[str, tuple]:
        """{name: (value, iteration)} — the d2 surface BestCheckpointer reads."""
        return dict(self._latest)

    def median(self, name: str) -> float:
        h = sorted(self._history[name])
        return h[len(h) // 2] if h else float("nan")

    def latest_with_smoothing_hint(self) -> Dict[str, tuple]:
        """Smoothed (median-over-window) view of every scalar, as d2's
        writers consume it."""
        return {
            name: (self.median(name), it)
            for name, (_, it) in self._latest.items()
        }

    def step(self) -> None:
        self.iter += 1


class JSONWriter:
    """d2-format metrics.json: one {"iteration": i, ...} dict per line.

    Like d2's JSONWriter, only scalars recorded SINCE the previous write are
    emitted — a metrics row never re-attributes a stale value (e.g. an old
    eval mIoU) to a later iteration."""

    def __init__(self, path: str, window_size: int = 20):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._path = path
        self._window = window_size
        self._last_write: Dict[str, int] = {}

    def write(self, storage: EventStorage) -> None:
        smoothed = storage.latest_with_smoothing_hint()
        fresh = {
            name: (value, it)
            for name, (value, it) in smoothed.items()
            if it > self._last_write.get(name, -1)
        }
        if not fresh:
            return
        row = {"iteration": storage.iter}
        for name, (value, it) in fresh.items():
            row[name] = value
            self._last_write[name] = it
        with open(self._path, "a") as f:
            f.write(json.dumps(row) + "\n")

    def close(self) -> None:
        pass


class TensorBoardWriter:
    """SummaryWriter-backed scalar writer; no-op when tensorboard is absent.
    Each (scalar, iteration) point is emitted once (d2 semantics)."""

    def __init__(self, log_dir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer: Optional[object] = SummaryWriter(log_dir=log_dir)
        except Exception:  # pragma: no cover - tensorboard not installed
            self._writer = None
        self._last_write: Dict[str, int] = {}

    def write(self, storage: EventStorage) -> None:
        if self._writer is None:
            return
        for name, (value, it) in storage.latest().items():
            if it > self._last_write.get(name, -1):
                self._writer.add_scalar(name, value, it)
                self._last_write[name] = it

    def close(self) -> None:
        if self._writer is not None:
            self._writer.flush()
            self._writer.close()
