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


# --------------------------------------------------------------------------
# Multi-process decode (the reference's DataLoader num_workers=4 + spawn,
# utils/setup.py:10-27 / train.py:48): worker subprocesses each construct the
# dataset from the pickled config and push finished batches through an mp
# queue. Workers never import jax — audio decode is numpy + the native
# ctypes library — so they stay clear of the TPU runtime.


def _worker_main(args, callable_name, worker_id, batch_size, q):
    import os
    import traceback
    os.environ["JAX_PLATFORMS"] = "cpu"  # defensive: workers must not attach
    # hard guard for library code (e.g. _process_seed): this process is a
    # decode worker — never consult jax, even though the forkserver template
    # has it imported via sitecustomize
    os.environ["AID_TPU_DATA_WORKER"] = "1"
    try:
        from aid_tpu.utils.containers import EasyDict
        from aid_tpu.utils.registry import call_func_by_name
        args = EasyDict(args)
        # decorrelate workers: each draws from a different stream
        args["exp"]["seed"] = int(args["exp"].get("seed", 42)) + 7919 * (worker_id + 1)
        ds = call_func_by_name(args, func_name=callable_name)
        for item in batched(iter(ds), batch_size):
            q.put(("ok", item))
    except BaseException:
        q.put(("err", traceback.format_exc()))


class MultiProcessLoader:
    """N spawned decode workers feeding one bounded batch queue.

    Batches arrive in completion order (like torch DataLoader without
    in-order guarantees); each worker owns an independently-seeded stream of
    the same dataset, so the union is the same distribution at N times the
    decode throughput."""

    def __init__(self, args, callable_name: str, batch_size: int,
                 num_workers: int, prefetch_depth: int = 4):
        import copy
        import multiprocessing as mp
        # forkserver: children start from a clean template process — no
        # re-import of the caller's __main__ (spawn would re-run scripts
        # without a __main__ guard) and no fork()ing of a parent that already
        # holds jax/TPU runtime threads
        ctx = mp.get_context("forkserver")
        self._q = ctx.Queue(maxsize=max(prefetch_depth, num_workers))
        self._procs = []
        for w in range(num_workers):
            p = ctx.Process(
                target=_worker_main,
                args=(copy.deepcopy(dict(args)), callable_name, w,
                      batch_size, self._q),
                daemon=True)
            p.start()
            self._procs.append(p)

    def __iter__(self):
        return self

    def __next__(self):
        status, payload = self._q.get()
        if status == "err":
            self.close()
            raise RuntimeError(f"data worker failed:\n{payload}")
        return payload

    def close(self):
        for p in self._procs:
            if p.is_alive():
                p.terminate()
        for p in self._procs:
            p.join(timeout=5)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
