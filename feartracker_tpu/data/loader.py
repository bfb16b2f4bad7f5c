"""Batch loader: shuffling, thread-pool item assembly, background prefetch.

Replaces the reference's torch DataLoader + DistributedSampler wiring
(ref: base_lightning_model.py:88-132). Threads (not processes) do the work:
cv2 and numpy release the GIL for the heavy ops, and the multi-host story is
handled by per-host index sharding (``host_id``/``num_hosts`` ≙
``DistributedSampler(world_size, rank)``, base_lightning_model.py:113-116).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List

import numpy as np

STACK_EXCLUDE_TYPES = (str, bytes)


def collate(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack arrays; keep strings/indices as lists
    (ref: tracking_dataset.py:25-39 ``collate_fn``)."""
    out: Dict[str, Any] = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], STACK_EXCLUDE_TYPES) or not np.isscalar(vals[0]) and not hasattr(vals[0], "shape"):
            out[k] = vals if isinstance(vals[0], STACK_EXCLUDE_TYPES) else np.asarray(vals)
        else:
            out[k] = np.stack([np.asarray(v) for v in vals])
    return out


def prefetch_to_device(iterator: Iterator, put, depth: int = 2) -> Iterator:
    """Apply ``put`` (a device_put/shard transfer) ``depth`` items ahead of
    the consumer, overlapping host→device transfer with device compute —
    JAX transfers are asynchronous, so batch t+1's upload rides behind step
    t's execution. ``depth=1`` degenerates to eager per-item transfer;
    each prefetched item holds device memory, so keep depth small."""
    if depth < 1:
        raise ValueError(f"depth must be >= 1, got {depth}")
    buf: List[Any] = []
    for item in iterator:
        buf.append(put(item))
        if len(buf) >= depth:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 2,
        drop_last: bool = True,
        seed: int = 0,
        host_id: int = 0,
        num_hosts: int = 1,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.dataset) // self.num_hosts
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host shard (≙ DistributedSampler)
        return idx[self.host_id :: self.num_hosts]

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        self.epoch += 1
        indices = self._indices()
        n_batches = len(self)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            """Bounded put that keeps checking the stop flag — an abandoned
            consumer (e.g. train_percent-limited epochs) must not leave the
            producer parked on a full queue forever."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for b in range(n_batches):
                        if stop.is_set():
                            return
                        batch_idx = indices[b * self.batch_size : (b + 1) * self.batch_size]
                        items = list(pool.map(self.dataset.__getitem__, batch_idx))
                        if not put(collate(items)):
                            return
            except BaseException as e:  # surface worker errors to the consumer
                put(e)                   # (a dead producer would deadlock q.get)
                return
            put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
