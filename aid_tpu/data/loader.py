"""Host-side batching / prefetching for training iterators.

The reference gets batching+parallelism from torch DataLoader with 4 worker
subprocesses (utils/setup.py:10-27, conf/exp/*:num_workers). The TPU-native
equivalent keeps data on the host side of the SPMD boundary: a thread-pool
prefetcher (audio decode releases the GIL inside the native reader / numpy)
feeding pinned numpy batches; device placement happens in the trainer via
``make_array_from_process_local_data``. Per-host sharding for multi-process
runs comes from seeding with ``jax.process_index()`` (replacing the
rank-sharded InfiniteSampler, reference misc.py:110-141).
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


def batched(sample_iter: Iterator, batch_size: int):
    """Group an iterator of (segment [T], fs) into ([B,T], [B]) batches."""
    while True:
        xs, fss = [], []
        for _ in range(batch_size):
            x, fs = next(sample_iter)
            xs.append(np.asarray(x, np.float32))
            fss.append(fs)
        T = max(x.shape[-1] for x in xs)
        out = np.zeros((batch_size, T), np.float32)
        for i, x in enumerate(xs):
            out[i, :x.shape[-1]] = x
        yield out, np.asarray(fss, np.int64)


class Prefetcher:
    """Background-thread prefetch of a batch iterator (depth-bounded)."""

    def __init__(self, it: Iterator, depth: int = 4):
        self._it = it
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        try:
            for item in self._it:
                self._q.put(item)
        except BaseException as e:  # surfaced on next()
            self._err = e
            self._q.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise self._err if self._err else StopIteration
        return item


def make_train_loader(sample_iter: Iterator, batch_size: int,
                      prefetch_depth: int = 4):
    return Prefetcher(batched(sample_iter, batch_size), depth=prefetch_depth)
