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


def _process_worker(
    out_q,
    dataset,
    collate,
    collate_kwargs,
    index_kwargs,
    seed,
    start_step,
    worker_id,
    num_procs,
    batch_size,
):
    """Module-level worker body (picklable for the forkserver context):
    builds whole batches for steps start+worker_id, start+worker_id+P, ...
    Deterministic: the index stream is fast-forwarded per step, and sample
    RNG is keyed on the global (seed, step, slot)."""
    index_iter = iter(ShardedIndexIterator(len(dataset), **index_kwargs))
    step = start_step + worker_id
    for _ in range(step * batch_size):
        next(index_iter)
    while True:
        idxs = [next(index_iter) for _ in range(batch_size)]
        samples = []
        for slot, idx in enumerate(idxs):
            rng = np.random.default_rng((seed, step, slot))
            try:
                samples.append(dataset.__getitem__(idx, rng=rng))
            except TypeError:
                samples.append(dataset[idx])
        out_q.put((step, collate(samples, **collate_kwargs)))
        # Skip the (P-1) steps owned by the other workers.
        for _ in range((num_procs - 1) * batch_size):
            next(index_iter)
        step += num_procs


class PrefetchLoader:
    """Thread-based by default; `num_procs > 0` switches to worker
    PROCESSES (each building whole batches for steps `w, w+P, ...`) — the
    GIL caps thread throughput at ~1 core of Python/PIL work, which on a
    multi-chip slice cannot keep up with ~ms-scale steps (SURVEY §7
    "host-bound augmentation throughput").  Workers use the forkserver
    context: forking the parent directly would snapshot a process that
    already carries JAX/TPU-client, relay-grpc, and AOT-compile threads
    (documented deadlock hazard, ADVICE r2); the forkserver parent is a
    clean process, and the dataset/collate travel to it by pickle.
    Sample RNG is keyed (seed, step, slot) either way, so worker topology
    never changes the data stream."""

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
        num_procs: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate = collate
        self.collate_kwargs = collate_kwargs or {}
        self.seed = seed
        self._index_kwargs = dict(
            shard_id=shard_id, num_shards=num_shards, shuffle=shuffle,
            repeat=True, seed=seed,
        )
        self.indices = ShardedIndexIterator(len(dataset), **self._index_kwargs)
        self.num_workers = max(1, num_workers)
        self.num_procs = max(0, num_procs)
        self.prefetch = max(1, prefetch)
        self._queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._procs: list = []
        self._mp_queue = None
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

    # -- worker-process producer path -----------------------------------
    def _consume_mp(self):
        """Reorder (step, batch) pairs from the worker pool into step
        order on the bounded thread queue."""
        pending: Dict[int, Dict] = {}
        expect = self._start_step
        while not self._stop.is_set():
            while expect not in pending:
                try:
                    s, b = self._mp_queue.get(timeout=0.5)
                except Exception:  # noqa: BLE001 — queue.Empty
                    if self._stop.is_set():
                        return
                    if self._procs and not any(p.is_alive() for p in self._procs):
                        # All workers died (e.g. the dataset failed to
                        # unpickle in the forkserver child) — fall back to
                        # the in-process thread producer from this step.
                        import logging

                        logging.getLogger("textboost_tpu").warning(
                            "prefetch worker processes died; falling back "
                            "to the thread producer"
                        )
                        self._procs = []
                        self._start_step = expect
                        self._produce()
                        return
                    continue
                pending[s] = b
            batch = pending.pop(expect)
            while not self._stop.is_set():
                try:
                    self._queue.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue
            expect += 1

    def _start_mp(self):
        import multiprocessing as mp

        # forkserver: children descend from a clean server process, never
        # from this (JAX-threaded) parent — fork here deadlocks (ADVICE r2).
        ctx = mp.get_context("forkserver")
        # Workers block when the parent falls behind: bounded queue.
        self._mp_queue = ctx.Queue(maxsize=max(2 * self.num_procs, 4))
        try:
            for w in range(self.num_procs):
                p = ctx.Process(
                    target=_process_worker,
                    args=(
                        self._mp_queue,
                        self.dataset,
                        self.collate,
                        self.collate_kwargs,
                        self._index_kwargs,
                        self.seed,
                        self._start_step,
                        w,
                        self.num_procs,
                        self.batch_size,
                    ),
                    daemon=True,
                )
                p.start()
                self._procs.append(p)
        except Exception as e:  # noqa: BLE001 — unpicklable dataset etc.
            import logging

            logging.getLogger("textboost_tpu").warning(
                "prefetch worker processes unavailable (%r); using the "
                "thread producer", e,
            )
            for p in self._procs:
                p.terminate()
            self._procs = []
            self._thread = threading.Thread(target=self._produce, daemon=True)
            self._thread.start()
            return
        self._thread = threading.Thread(target=self._consume_mp, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator[Dict]:
        if self._thread is None:
            if self.num_procs > 0:
                self._start_mp()
            else:
                self._thread = threading.Thread(target=self._produce, daemon=True)
                self._thread.start()
        while True:
            # Bounded get so a consumer thread (e.g. DeviceBatchPrefetcher)
            # unblocks and ends cleanly once stop() is called.  Already-
            # QUEUED batches drain first; a producer's in-flight batch that
            # lands just after a post-stop Empty is dropped (best-effort —
            # teardown only, ADVICE r4).
            try:
                yield self._queue.get(timeout=0.5)
            except queue.Empty:
                if self._stop.is_set():
                    return

    def stop(self):
        self._stop.set()
        for p in self._procs:
            p.terminate()
        self._procs = []


class DeviceBatchPrefetcher:
    """Device-resident batch ring: dispatches host->device transfers up to
    `depth` batches ahead of consumption.

    The train loop's one-ahead async ``device_put`` only hides a transfer
    that is FASTER than the device step.  Through the tunneled relay the
    per-step batch (~6.3 MB uint8 at bs8/512px) can exceed the step time
    when bandwidth degrades (measured: loop windows at 475-830 ms/step
    against a 226 ms device step, CLAUDE.md r4 addendum).  Dispatching K
    transfers ahead — started at the END of Trainer setup, so the early
    ones ride the tunnel during the compile-dominated setup window (step
    AOT wait, first-sync tax) — builds headroom the loop then consumes:
    the tunnel stays busy continuously instead of racing each step.

    Single-process only: cross-process batch assembly
    (``make_array_from_process_local_data``) is collective-ordered and must
    stay on the main thread (see assemble_global_batch).

    Counterpart of the reference's DataLoader pin_memory/non_blocking
    prefetch (train_textboost.py:886-909) — except the reference's device
    is local, so one-ahead suffices there.
    """

    def __init__(self, fetch_host: Callable, to_device: Callable, depth: int):
        self._fetch_host = fetch_host
        self._to_device = to_device
        # The queue bounds in-flight transfers (host buffers pinned by the
        # runtime until each lands, plus the device-side HBM for the ring).
        self._queue: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "DeviceBatchPrefetcher":
        assert self._thread is None, "already started"
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def _run(self):
        try:
            while not self._stop.is_set():
                dev = self._to_device(self._fetch_host())
                while not self._stop.is_set():
                    try:
                        self._queue.put(dev, timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # noqa: BLE001 — re-raised on next()
            self._error = e

    def next(self):
        """Pop the next device batch (blocks if the producer is behind);
        re-raises any producer failure on the caller's thread — but only
        after already-transferred batches have drained."""
        while True:
            try:
                return self._queue.get_nowait()
            except queue.Empty:
                pass
            if self._error is not None:
                raise self._error
            try:
                return self._queue.get(timeout=0.5)
            except queue.Empty:
                # Re-check the stored error AFTER the blocking wait: the
                # producer may have failed and exited during it, and the
                # generic "thread died" would mask the root cause
                # (ADVICE r4).
                if self._error is not None:
                    raise self._error
                if self._thread is not None and not self._thread.is_alive():
                    raise RuntimeError("device prefetcher thread died")

    def stop(self):
        self._stop.set()
