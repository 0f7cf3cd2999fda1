"""Batch loader with background prefetch.

Replaces torch DataLoader (reference tools/train.py:96-102): shuffling,
fixed-shape NHWC batches, drop_last, and a worker thread pool that
overlaps the cv2 augmentation pipeline (SURVEY §7 hard part #4) with TPU
steps. Threads (not processes) are used: cv2/numpy release the GIL for
the heavy ops, and the single-process model keeps device buffers simple.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 2,
        seed: int = 304,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        stop = (
            len(order) - len(order) % self.batch_size
            if self.drop_last
            else len(order)
        )
        for start in range(0, stop, self.batch_size):
            yield order[start : start + self.batch_size]

    def _collate(self, samples):
        if len(samples[0]) == 3:  # test split: (image, size, name)
            imgs, sizes, names = zip(*samples)
            return np.stack(imgs), np.stack(sizes), list(names)
        imgs, labels, edges, sizes, names = zip(*samples)
        return (
            np.stack(imgs).astype(np.float32),
            np.stack(labels).astype(np.int32),
            np.stack(edges).astype(np.float32),
            np.stack(sizes),
            list(names),
        )

    def __iter__(self):
        self.epoch += 1
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self.epoch)
        out: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idx_batch in self._batches():
                    if stop.is_set():
                        return
                    samples = list(pool.map(self.dataset.__getitem__, idx_batch))
                    out.put(self._collate(samples))
            out.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = out.get()
                if batch is None:
                    break
                yield batch
        finally:
            stop.set()
