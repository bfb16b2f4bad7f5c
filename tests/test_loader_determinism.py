"""Regression tests for the review findings: seeded reproducibility across
loader threads, per-epoch reshuffle, and producer shutdown on early exit."""

import threading
import time

import numpy as np

from feartracker_tpu.data.loader import BatchLoader
from feartracker_tpu.utils import constants as C


class _RngProbeDataset:
    """Mimics SiameseTrackingDataset's per-item rng derivation."""

    def __init__(self, seed):
        self.base_seed = seed
        self.epoch = 0

    def __len__(self):
        return 16

    def __getitem__(self, idx):
        rng = np.random.RandomState((self.base_seed * 1000003 + self.epoch * 10007 + idx) % (2**31 - 1))
        time.sleep(0.001 * (idx % 3))  # jitter thread interleaving
        return {"x": rng.rand(4).astype(np.float32), C.SAMPLE_INDEX_KEY: idx}

    def resample(self):
        self.epoch += 1


def _run_epoch(loader):
    out = {}
    for batch in loader:
        for i, idx in enumerate(batch[C.SAMPLE_INDEX_KEY]):
            out[int(idx)] = batch["x"][i]
    return out


def test_seeded_runs_identical_across_threads():
    a = _run_epoch(BatchLoader(_RngProbeDataset(0), batch_size=4, num_workers=4, seed=1))
    b = _run_epoch(BatchLoader(_RngProbeDataset(0), batch_size=4, num_workers=4, seed=1))
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_epochs_reshuffle_with_one_loader():
    ds = _RngProbeDataset(0)
    loader = BatchLoader(ds, batch_size=4, num_workers=1, seed=3)
    order1 = [int(i) for b in loader for i in b[C.SAMPLE_INDEX_KEY]]
    order2 = [int(i) for b in loader for i in b[C.SAMPLE_INDEX_KEY]]
    assert order1 != order2  # epoch counter must advance the shuffle
    assert sorted(order1) == sorted(order2)


def test_early_exit_stops_producer_thread():
    ds = _RngProbeDataset(0)
    loader = BatchLoader(ds, batch_size=2, num_workers=2, seed=0, prefetch=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # consumer abandons the epoch (e.g. train_percent limit)
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_prefetch_to_device_order_and_depth():
    from feartracker_tpu.data.loader import prefetch_to_device

    calls = []

    def put(x):
        calls.append(x)
        return x * 10

    src = iter(range(6))
    gen = prefetch_to_device(src, put, depth=3)
    first = next(gen)
    assert first == 0
    # put ran `depth` items ahead of the consumer
    assert calls == [0, 1, 2]
    assert list(gen) == [10, 20, 30, 40, 50]
    assert calls == list(range(6))

    # depth=1 degenerates to eager per-item transfer; bad depth rejected
    assert list(prefetch_to_device(iter([7]), put, depth=1)) == [70]
    import pytest

    with pytest.raises(ValueError):
        next(prefetch_to_device(iter([1]), put, depth=0))
