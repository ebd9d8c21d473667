"""Batch loader with thread or process workers and device prefetch.

The reference feeds models with torch DataLoader worker processes
(reference: src/inference.py:178-183, src/train_vto.py:400-432).  On
TPU the input pipeline's job is to keep the jitted step from ever
waiting on the host: workers map ``dataset[i]`` (PIL/numpy CPU work),
batches are collated to numpy, and up to ``prefetch`` batches are
staged ahead; callers combine this with ``core.mesh.shard_batch`` for
sharded device puts.

``workers_mode="process"`` forks a pool like torch's DataLoader — the
escape hatch when per-item preprocessing is Python/PIL-heavy and the
GIL would serialize threads (the C++ native fast paths in
``data.native`` release the GIL, so threads are the cheaper default).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np

# process-pool plumbing: the dataset is shipped once per worker via the
# initializer (fork), not re-pickled per __getitem__ call
_worker_dataset = None


def _init_worker(dataset):
    global _worker_dataset
    _worker_dataset = dataset


def _worker_getitem(i: int):
    return _worker_dataset[i]


def collate(items: Sequence[dict]) -> dict:
    """Stack array fields; keep string fields as lists."""
    out: dict = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.floating, np.integer)):
            out[key] = np.asarray(vals)
        else:
            out[key] = list(vals)
    return out


class BatchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch: int = 2,
        seed: int = 0,
        pad_last: bool = False,
        workers_mode: str = "thread",
    ):
        assert workers_mode in ("thread", "process")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.pad_last = pad_last
        self.workers_mode = workers_mode
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> list[list[int]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        batches = []
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size].tolist()
            if len(idx) < self.batch_size:
                if self.drop_last:
                    continue
                if self.pad_last:  # repeat to static batch for XLA
                    idx = idx + idx[: self.batch_size - len(idx)]
            batches.append(idx)
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def produce():
            if self.workers_mode == "process":
                import multiprocessing as mp

                ctx = mp.get_context("fork")
                with ctx.Pool(self.num_workers, initializer=_init_worker,
                              initargs=(self.dataset,)) as pool:
                    for idx in batches:
                        items = pool.map(_worker_getitem, idx)
                        q.put(collate(items))
            else:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for idx in batches:
                        items = list(pool.map(self.dataset.__getitem__,
                                              idx))
                        q.put(collate(items))
            q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()


def resize_chw_np(arr: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    """Bilinear resize of a (C, H, W) float array (dense UV maps)."""
    import cv2

    c = arr.shape[0]
    out = np.stack([
        cv2.resize(arr[i], (hw[1], hw[0]), interpolation=cv2.INTER_LINEAR)
        for i in range(c)
    ])
    return out
