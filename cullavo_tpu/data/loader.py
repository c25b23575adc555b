"""Batched data loader with background prefetch.

Replaces the reference's detectron2 ``build_batch_data_loader`` +
TrainingSampler/InferenceSampler (datasets/build.py:319-402) with a
dependency-free loader: mapper workers on a thread pool, a bounded prefetch
queue (the reference's loaders prefetch via torch DataLoader workers), an
infinite shuffled sampler for training and a sharded sequential sampler for
eval (each process reads its own slice — the SPMD equivalent of
InferenceSampler).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional, Sequence

import numpy as np


def training_indices(n: int, seed: int = 0, shuffle: bool = True) -> Iterator[int]:
    """Infinite (re-shuffled per epoch) index stream — TrainingSampler."""
    epoch = 0
    while True:
        rng = np.random.default_rng(seed + epoch)
        order = rng.permutation(n) if shuffle else np.arange(n)
        yield from order.tolist()
        epoch += 1


def inference_indices(n: int, process_index: int = 0, process_count: int = 1):
    """Shard [0, n) contiguously across processes — InferenceSampler."""
    per = (n + process_count - 1) // process_count
    start = process_index * per
    return list(range(start, min(start + per, n)))


class DataLoader:
    """records + mapper + collate → prefetched batch iterator."""

    def __init__(self, records: Sequence, mapper: Callable, collate: Callable,
                 batch_size: int, shuffle: bool = True, seed: int = 0,
                 num_workers: int = 4, prefetch: int = 2,
                 drop_incomplete: bool = True, infinite: bool = False,
                 device_prefetch: bool = False, sharding=None):
        self.records = records
        self.mapper = mapper
        self.collate = collate
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_incomplete = drop_incomplete
        self.infinite = infinite
        # device_prefetch: H2D transfer happens in the producer thread so the
        # upload of batch N+1 overlaps the compute of batch N (the torch
        # equivalent is pin_memory+non_blocking; here it is an early
        # jax.device_put, optionally with a NamedSharding for SPMD input).
        self.device_prefetch = device_prefetch
        self.sharding = sharding

    def _batches_of_indices(self):
        if self.infinite:
            stream = training_indices(len(self.records), self.seed, self.shuffle)
            batch = []
            for idx in stream:
                batch.append(idx)
                if len(batch) == self.batch_size:
                    yield batch
                    batch = []
        else:
            order = (np.random.default_rng(self.seed).permutation(len(self.records))
                     if self.shuffle else np.arange(len(self.records)))
            for i in range(0, len(order), self.batch_size):
                chunk = order[i:i + self.batch_size].tolist()
                if len(chunk) < self.batch_size and self.drop_incomplete:
                    break
                yield chunk

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idxs in self._batches_of_indices():
                        if stop.is_set():
                            return
                        mapped = list(pool.map(
                            lambda i: self.mapper(self.records[i]), idxs))
                        batch = self.collate(mapped)
                        if self.device_prefetch:
                            import jax

                            batch = jax.tree.map(
                                lambda a: jax.device_put(a, self.sharding)
                                if hasattr(a, "shape") else a, batch)
                        q.put(batch)
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def __len__(self):
        if self.infinite:
            raise TypeError("infinite loader has no length")
        n = len(self.records) // self.batch_size
        if not self.drop_incomplete and len(self.records) % self.batch_size:
            n += 1
        return n
