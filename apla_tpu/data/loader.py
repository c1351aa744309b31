"""Host-side batched data loader with threaded prefetch.

Replaces the reference's torch DataLoader + worker processes
(`dataloader_params` in the YAML schema: batch_size/num_workers/shuffle/
drop_last/prefetch_factor).  Workers are threads (PIL/numpy release the GIL
for the heavy ops); batches are stacked NHWC numpy arrays ready for a single
`device_put` onto the mesh.  Determinism: every (epoch, index) pair gets its
own `np.random.Generator`, so runs are reproducible at any worker count —
stronger than the reference's global-RNG workers.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def default_collate(samples):
    """Stack a list of {'image': ..., 'label': ...} into batch arrays.
    Handles multi-crop lists (SSL): produces a list of stacked crop batches."""
    first = samples[0]
    out = {}
    img = first["image"]

    def _stack(arrs):
        stacked = np.stack(arrs)
        # uint8 passes through untouched (device-side augmentation path)
        if stacked.dtype == np.uint8:
            return stacked
        return stacked.astype(np.float32)

    if isinstance(img, list):
        n_crops = len(img)
        out["image"] = [_stack([s["image"][c] for s in samples])
                        for c in range(n_crops)]
    else:
        out["image"] = _stack([s["image"] for s in samples])
    labels = [s["label"] for s in samples]
    lab0 = np.asarray(labels[0])
    if lab0.ndim > 0:  # soft/multi-hot labels
        out["label"] = np.stack([np.asarray(l) for l in labels]).astype(np.float32)
    else:
        out["label"] = np.asarray(labels, dtype=np.int64)
    return out


def device_prefetch(loader, put_fn, depth: int = 1):
    """Yield (host_batch, device_batch) with `depth` batches shipped to the
    device ahead of consumption — `put_fn` (device_put/shard) is async in
    JAX, so the H2D transfer of batch N+1 overlaps step N's compute."""
    buf = []
    for b in loader:
        buf.append((b, put_fn(b)))
        if len(buf) > depth:
            yield buf.pop(0)
    yield from buf


class _ProducerError:
    """Carries a producer-thread exception through the batch queue."""

    def __init__(self, exc):
        self.exc = exc


class DataLoader:
    def __init__(self, dataset, batch_size=32, shuffle=False, drop_last=False,
                 num_workers=8, prefetch_factor=4, seed=0, collate_fn=None,
                 **unused):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = bool(shuffle)
        self.drop_last = bool(drop_last)
        self.num_workers = max(int(num_workers), 1)
        self.prefetch = max(int(prefetch_factor or 2), 1)
        self.seed = seed
        self.epoch = 0
        self.collate_fn = collate_fn or default_collate

    def set_epoch(self, epoch: int):
        """Reseeds the shuffle (reference DistributedSampler.set_epoch)."""
        self.epoch = int(epoch)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self.epoch))
            rng.shuffle(order)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, end, self.batch_size):
            yield order[start:min(start + self.batch_size, n)]

    def _load_sample(self, idx):
        rng = np.random.default_rng((self.seed, self.epoch, int(idx)))
        return self.dataset.__getitem__(int(idx), rng=rng)

    def __iter__(self):
        batches = list(self._index_batches())
        if not batches:
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_checking_stop(item) -> bool:
            # q.put with a plain block would deadlock if the consumer
            # abandons iteration while the queue is full (preemption exit,
            # tests) — re-check stop while waiting so the thread and its
            # pool always wind down
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # a sample-load/collate exception must reach the consumer —
            # dying without the sentinel would leave the main thread
            # blocked on q.get() forever (silent hang instead of the
            # data error)
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for idxs in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self._load_sample, idxs))
                        if not put_checking_stop(self.collate_fn(samples)):
                            return
            except BaseException as e:  # noqa: BLE001
                put_checking_stop(_ProducerError(e))
                return
            put_checking_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, _ProducerError):
                    raise RuntimeError(
                        "DataLoader worker failed") from item.exc
                yield item
        finally:
            stop.set()
