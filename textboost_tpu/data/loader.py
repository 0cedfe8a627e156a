"""Prefetching batch loader.

Counterpart of the reference's torch DataLoader + Wrapper stack
(train_textboost.py:872-909): an infinite stream of collated numpy batches,
produced by a thread pool (PIL decode/augment release the GIL for the
heavy parts) and prefetched ahead of the training step so the TPU never
waits on host work.  Determinism: sample i of global step s uses
rng = default_rng((seed, s, i)) regardless of worker scheduling.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, Optional

import numpy as np

from .sharding import ShardedIndexIterator


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        collate: Callable,
        *,
        shard_id: int = 0,
        num_shards: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        collate_kwargs: Optional[Dict] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.collate_kwargs = collate_kwargs or {}
        self.seed = seed
        self.indices = ShardedIndexIterator(
            len(dataset),
            shard_id=shard_id,
            num_shards=num_shards,
            shuffle=shuffle,
            repeat=True,
            seed=seed,
        )
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self._queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._start_step = 0

    def set_start_step(self, step: int) -> None:
        """Resume support: offset the per-sample RNG keys and fast-forward
        the index stream so a resumed run continues the data sequence
        instead of replaying it from batch 0."""
        assert self._thread is None, "set_start_step must precede iteration"
        self._start_step = int(step)

    def _produce(self):
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        try:
            index_iter = iter(self.indices)
            step = self._start_step
            for _ in range(self._start_step * self.batch_size):
                next(index_iter)
            while not self._stop.is_set():
                idxs = [next(index_iter) for _ in range(self.batch_size)]

                def fetch(args):
                    slot, idx = args
                    rng = np.random.default_rng((self.seed, step, slot))
                    try:
                        return self.dataset.__getitem__(idx, rng=rng)
                    except TypeError:
                        return self.dataset[idx]

                samples = list(pool.map(fetch, enumerate(idxs)))
                batch = self.collate(samples, **self.collate_kwargs)
                while not self._stop.is_set():
                    try:
                        self._queue.put(batch, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                step += 1
        finally:
            pool.shutdown(wait=False)

    def __iter__(self) -> Iterator[Dict]:
        if self._thread is None:
            self._thread = threading.Thread(target=self._produce, daemon=True)
            self._thread.start()
        while True:
            yield self._queue.get()

    def stop(self):
        self._stop.set()
