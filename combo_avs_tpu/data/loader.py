"""Data loaders: batched, frame-count-bucketed, thread-prefetched.

The reference uses detectron2's multi-worker torch DataLoader
(ref: train_net.py:111-123, DATALOADER.NUM_WORKERS). Here a thread pool maps
records and a background prefetcher keeps batches ahead of the device —
appropriate for this workload (224^2 pngs + pickled mels; decode is cheap
relative to a TPU step).

TPU-specific: videos are bucketed by frame count (AVSS mixes 5- and 10-frame
videos), so each batch is a single static shape and XLA compiles one graph
per bucket instead of padding to the max (SURVEY §7 hard part 5)."""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List

import numpy as np


def _stack_batch(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class TrainLoader:
    """Infinite shuffled loader over per-video records."""

    def __init__(
        self,
        records: List[dict],
        mapper: Callable[[dict], Dict[str, np.ndarray]],
        batch_size: int,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        assert records, "no records to load"
        self.records = records
        self.mapper = mapper
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)
        self.pool = ThreadPoolExecutor(num_workers)
        self.shard_index = shard_index
        self.num_shards = num_shards
        # bucket records by frame count for static shapes
        self.buckets: Dict[int, List[dict]] = {}
        for r in records:
            self.buckets.setdefault(r["num_frames"], []).append(r)
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _indices(self) -> Iterator[dict]:
        # d2's TrainingSampler is an infinite shuffled-permutation stream
        # (no within-epoch duplicates); kept per bucket so every global batch
        # is duplicate-free whenever batch_size <= bucket size, which also
        # makes the per-host slices of a global batch disjoint.
        streams = {k: iter(()) for k in self.buckets}
        while True:
            # sample a bucket proportional to its size, then a batch within it
            sizes = {k: len(v) for k, v in self.buckets.items()}
            total = sum(sizes.values())
            r = self.rng.rand() * total
            acc = 0
            for k, n in sizes.items():
                acc += n
                if r <= acc:
                    break
            bucket = self.buckets[k]
            idx = []
            while len(idx) < self.batch_size:
                for i in streams[k]:
                    idx.append(i)
                    if len(idx) == self.batch_size:
                        break
                else:
                    streams[k] = iter(self.rng.permutation(len(bucket)))
            # host sharding: each process takes its slice of the global batch
            per = self.batch_size // self.num_shards
            yield [bucket[i] for i in idx[self.shard_index * per : (self.shard_index + 1) * per]]

    def _worker(self):
        for recs in self._indices():
            if self._stop.is_set():
                return
            samples = list(self.pool.map(self.mapper, recs))
            self._queue.put(_stack_batch(samples))

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        return self._queue.get()

    def close(self):
        self._stop.set()
        try:
            self._queue.get_nowait()
        except queue.Empty:
            pass


def eval_loader(
    records: List[dict],
    mapper: Callable[[dict], Dict[str, np.ndarray]],
    batch_size: int = 1,
    num_workers: int = 4,
    with_records: bool = False,
) -> Iterator[Dict[str, np.ndarray]]:
    """Sequential one-pass loader; batches never mix frame counts.
    with_records=True yields (batch, records_chunk) so callers can attach
    per-video metadata (e.g. the visualization dump names its files)."""
    pool = ThreadPoolExecutor(num_workers)
    by_t: Dict[int, List[dict]] = {}
    for r in records:
        by_t.setdefault(r["num_frames"], []).append(r)
    for t, recs in sorted(by_t.items()):
        for i in range(0, len(recs), batch_size):
            chunk = recs[i : i + batch_size]
            samples = list(pool.map(mapper, chunk))
            batch = _stack_batch(samples)
            yield (batch, chunk) if with_records else batch
