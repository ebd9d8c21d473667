"""Batch loader with thread or process workers and device prefetch.

The reference feeds models with torch DataLoader worker processes
(reference: src/inference.py:178-183, src/train_vto.py:400-432).  On
TPU the input pipeline's job is to keep the jitted step from ever
waiting on the host: workers map ``dataset[i]`` (PIL/numpy CPU work),
batches are collated to numpy, and up to ``prefetch`` batches are
staged ahead; callers combine this with ``core.mesh.shard_batch`` for
sharded device puts.

``workers_mode="process"`` runs a worker pool like torch's DataLoader —
the escape hatch when per-item preprocessing is Python/PIL-heavy and
the GIL would serialize threads (the C++ native fast paths in
``data.native`` release the GIL, so threads are the cheaper default on
few-core hosts).  The pool uses the ``forkserver`` start method and is
created once per loader: workers are forked from a clean server
process, never from this (threaded, JAX-initialized) process, so
process mode is safe to select at any point — including after backend
init.  ``workers_mode="auto"`` picks process workers when the host has
at least ``AUTO_PROCESS_MIN_CPUS`` cores and threads below that
(measured: on a 1-core host the thread pool did 8.0 items/s vs 5.6 for
the fork pool — IPC overhead only pays for itself once enough cores
exist to out-scale the GIL'd Python remainder; see docs/PERF.md).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np

# "auto" picks process workers at/above this core count.  Below it the
# measured thread pool wins (1-core: 8.0 vs 5.6 items/s); at 8+ cores
# the per-item Python/PIL share (~55% of item time with the C++ core
# doing the rest) serializes threads at ~2x single-thread throughput,
# while 8 processes scale it ~linearly.
AUTO_PROCESS_MIN_CPUS = 8


def _resolve_workers_mode(mode: str) -> str:
    if mode != "auto":
        return mode
    return ("process" if (os.cpu_count() or 1) >= AUTO_PROCESS_MIN_CPUS
            else "thread")

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
        workers_mode: str = "auto",
    ):
        assert workers_mode in ("thread", "process", "auto")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.pad_last = pad_last
        self.workers_mode = _resolve_workers_mode(workers_mode)
        self._epoch = 0
        self._pool = None

    def _process_pool(self):
        """Persistent forkserver pool, created once per loader.

        forkserver keeps a pristine server process; workers fork from
        it, not from this process — immune to the fork-from-threaded-
        process deadlocks a plain fork pool risks after JAX init.
        """
        if self._pool is None:
            import multiprocessing as mp

            ctx = mp.get_context("forkserver")
            self._pool = ctx.Pool(self.num_workers,
                                  initializer=_init_worker,
                                  initargs=(self.dataset,))
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

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
                    # loop: one repetition is not enough when the
                    # remainder is under half the batch (e.g. a 2-item
                    # dataset at batch 8)
                    while len(idx) < self.batch_size:
                        idx = idx + idx[: self.batch_size - len(idx)]
            batches.append(idx)
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        # The pool (if any) is created here, on the caller's thread —
        # the producer thread below only submits work to it.
        pool = (self._process_pool()
                if self.workers_mode == "process" else None)

        def produce():
            if pool is not None:
                for idx in batches:
                    items = pool.map(_worker_getitem, idx)
                    q.put(collate(items))
            else:
                with ThreadPoolExecutor(self.num_workers) as tpool:
                    for idx in batches:
                        items = list(tpool.map(self.dataset.__getitem__,
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
