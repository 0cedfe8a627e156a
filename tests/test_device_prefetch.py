"""Device-resident batch ring (data/loader.py::DeviceBatchPrefetcher).

The ring dispatches h2d transfers ahead of consumption so a slow tunnel
never starves the train loop (CLAUDE.md r4 addendum: 6.3 MB/step at
<15 MB/s exceeded the 226 ms device step).  Correctness invariants:
order preservation, bounded run-ahead, producer-failure propagation,
clean shutdown, and — the load-bearing one — the data stream is
IDENTICAL with the ring on or off, because sample RNG is keyed on the
global (seed, step, slot), never on worker/prefetch topology.
"""
import threading
import time

import numpy as np
import pytest

from textboost_tpu.data.loader import DeviceBatchPrefetcher, PrefetchLoader


def test_order_preserved_and_bounded_runahead():
    produced = []
    lock = threading.Lock()
    counter = iter(range(10_000))

    def fetch():
        with lock:
            v = next(counter)
            produced.append(v)
        return v

    pf = DeviceBatchPrefetcher(fetch, lambda x: x * 2, depth=3).start()
    try:
        got = [pf.next() for _ in range(20)]
        assert got == [2 * i for i in range(20)]
        # Producer may hold depth queued + 1 in flight beyond what was
        # consumed, never unbounded.
        time.sleep(0.2)
        with lock:
            assert len(produced) <= 20 + 3 + 1
    finally:
        pf.stop()


def test_producer_error_propagates():
    def fetch():
        raise ValueError("boom in producer")

    pf = DeviceBatchPrefetcher(fetch, lambda x: x, depth=2).start()
    with pytest.raises(ValueError, match="boom in producer"):
        pf.next()
    pf.stop()


def test_error_after_good_batches():
    state = {"n": 0}

    def fetch():
        state["n"] += 1
        if state["n"] > 2:
            raise RuntimeError("late failure")
        return state["n"]

    pf = DeviceBatchPrefetcher(fetch, lambda x: x, depth=8).start()
    assert pf.next() == 1
    assert pf.next() == 2
    with pytest.raises(RuntimeError, match="late failure"):
        pf.next()
    pf.stop()


def test_stop_unblocks_producer_blocked_on_full_queue():
    pf = DeviceBatchPrefetcher(lambda: 1, lambda x: x, depth=1).start()
    time.sleep(0.1)  # producer fills the depth-1 queue and blocks on put
    pf.stop()
    pf._thread.join(timeout=5)
    assert not pf._thread.is_alive()


def test_consumer_of_stopped_loader_ends_cleanly():
    """A DeviceBatchPrefetcher feeding from a stopped PrefetchLoader must
    end (StopIteration surfaced as its error), not hang forever — the
    Trainer stops loaders on every train() exit path."""
    loader = PrefetchLoader(
        list(range(8)), batch_size=2, collate=lambda s: s, num_workers=1,
        shuffle=False,
    )
    it = iter(loader)
    next(it)  # producer running
    pf = DeviceBatchPrefetcher(lambda: next(it), lambda x: x, depth=2)
    loader.stop()
    time.sleep(0.1)
    pf.start()
    pf._thread.join(timeout=10)
    assert not pf._thread.is_alive()
    pf.stop()


@pytest.fixture(scope="module")
def instance_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("instance")
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (160, 160, 3), dtype=np.uint8)).save(
        d / "dog.jpg"
    )
    return str(d)


def test_training_stream_identical_with_and_without_ring(instance_dir, tmp_path):
    """Bit-identical loss trajectory with the ring on vs off: the ring may
    change WHEN batches cross the wire, never WHAT they contain."""
    from textboost_tpu.train import TrainConfig, Trainer

    losses = {}
    for depth in (0, 4):
        cfg = TrainConfig(
            model_preset="tiny",
            instance_data_dir=instance_dir,
            placeholder_token="<dog>",
            instance_token="<dog>",
            initializer_token="dog",
            output_dir=str(tmp_path / f"run{depth}"),
            resolution=128,
            train_batch_size=2,
            max_train_steps=3,
            checkpointing_steps=0,
            validation_steps=0,
            lora_rank=4,
            augment="pda",
            augment_inversion=True,
            template="textboost",
            seed=0,
            dataloader_num_workers=1,
            mixed_precision="no",
            human_prompts_path=None,
            device_prefetch_batches=depth,
        ).validate()
        trainer = Trainer(cfg)
        assert (trainer._prefetcher is not None) == (depth > 0)
        result = trainer.train()
        losses[depth] = result["loss"]
    assert losses[0] == losses[4]
