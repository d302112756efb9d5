"""MAESTRO v3 dataset loaders (CSV-metadata driven).

Capability parity with reference datasets/maestro_dataset.py:
``MaestroDataset_fs`` (:31-102 — infinite sampler: filter CSV by years+split,
random file, 8 random native-rate segments per file, yields (segment, fs)),
``MaestroDataset`` (:103-181 fixed-rate variant) and
``MaestroDatasetTestChunks`` (maestro_dataset_test.py:30-74 — first
num_samples test files, one fixed chunk at a 10 s offset, returns
(audio, fs, filename)).

Multi-host: the shuffle RNG folds in jax.process_index() so each host draws a
disjoint stream (replacing the reference's rank-sharded InfiniteSampler,
utils/torch_utils/misc.py:110-141).
"""
from __future__ import annotations

import csv
import os
from typing import Iterator, List, Tuple

import numpy as np

from aid_tpu.data import audio_io


def _process_seed(base: int) -> int:
    """Per-host seed sharding (the InfiniteSampler role, reference
    misc.py:110-141). Consults jax.process_index() ONLY when a jax backend is
    ALREADY INITIALIZED in this process: merely checking ``'jax' in
    sys.modules`` is not enough, because decode-worker subprocesses start
    from a forkserver template whose sitecustomize imports jax — calling
    process_index() there would *attach a backend* from the worker, and the
    single-tenant TPU tunnel blocks a second client (this deadlocked the
    multi-process loader). In real multi-host runs the trainer initializes
    jax.distributed before datasets are constructed, so the backend check
    passes exactly when sharding is meaningful."""
    import os
    import sys
    if os.environ.get("AID_TPU_DATA_WORKER"):
        return int(base)
    jax = sys.modules.get("jax")
    if jax is not None:
        try:
            from jax._src import xla_bridge as _xb
            if _xb._backends:  # attached already; safe + meaningful to ask
                return int(base) + 1000003 * jax.process_index()
        except Exception:
            pass
    return int(base)


def _load_metadata(root: str) -> List[dict]:
    candidates = [os.path.join(root, "maestro-v3.0.0.csv"),
                  os.path.join(root, "maestro-v2.0.0.csv")]
    for c in candidates:
        if os.path.exists(c):
            with open(c, newline="") as f:
                return list(csv.DictReader(f))
    raise FileNotFoundError(f"no maestro metadata CSV under {root}")


class MaestroDatasetFs:
    """Infinite train iterator yielding (native-rate segment [T], fs)."""

    SEGMENTS_PER_FILE = 8

    def __init__(self, args, *rest, **kw):
        dset = args.dset
        self.path = str(dset.path)
        self.years = set(int(y) for y in dset.get("years", []))
        self.load_len = int(dset.get("load_len", 405000))
        self.overfit = bool(dset.get("overfit", False))
        self.segments_per_file = int(dset.get("segments_per_file",
                                              self.SEGMENTS_PER_FILE))
        self.seed = _process_seed(int(args.exp.get("seed", 42)))
        meta = _load_metadata(self.path)
        self.files = [os.path.join(self.path, r["audio_filename"])
                      for r in meta
                      if r.get("split") == "train"
                      and (not self.years or int(r["year"]) in self.years)]
        if not self.files:
            raise FileNotFoundError(
                f"no train files for years {sorted(self.years)} under {self.path}")

    def __iter__(self) -> Iterator[Tuple[np.ndarray, int]]:
        rng = np.random.default_rng(self.seed)
        if self.overfit:
            # single cached segment forever (reference maestro_dataset.py:34 —
            # the "is dataloading bottlenecking?" fixture)
            f = self.files[0]
            n, fs, _ = audio_io.info(f)
            x, fs = audio_io.read(f, 0, min(self.load_len, n))
            while True:
                yield x, fs
        # Same hardening as LibrispeechTrain: skips are counted so a corpus
        # where every file is undecodable or shorter than load_len aborts
        # loudly instead of spinning in `continue` forever.
        failures = 0
        while True:
            f = self.files[rng.integers(len(self.files))]
            try:
                n, fs, _ = audio_io.info(f)
            except Exception as e:
                failures += 1
                if failures >= 50:
                    raise RuntimeError(
                        f"{failures} consecutive unusable files under "
                        f"{self.path!r} (last: {f!r}: {e})") from e
                continue
            if n < self.load_len:
                failures += 1
                if failures >= 50:
                    raise RuntimeError(
                        f"{failures} consecutive unusable files under "
                        f"{self.path!r}: files shorter than load_len="
                        f"{self.load_len} (last: {f!r} with {n} samples); "
                        f"lower dset.load_len")
                continue
            failures = 0
            for _ in range(self.segments_per_file):
                start = int(rng.integers(0, n - self.load_len + 1))
                x, _ = audio_io.read(f, start, self.load_len)
                yield x, fs


class MaestroDataset(MaestroDatasetFs):
    """Fixed-rate variant (reference maestro_dataset.py:103-181): resamples on
    the host to exp.sample_rate so fs is constant downstream."""

    def __init__(self, args, *rest, **kw):
        super().__init__(args, *rest, **kw)
        self.target_fs = int(args.exp.sample_rate)
        self.seg_len = int(args.exp.audio_len)

    def __iter__(self):
        for x, fs in super().__iter__():
            y = audio_io.resample_host(x, fs, self.target_fs)
            if y.shape[-1] < self.seg_len:
                y = np.pad(y, (0, self.seg_len - y.shape[-1]))
            yield y[:self.seg_len], self.target_fs


class MaestroDatasetTestChunks:
    """Finite test set: (audio, fs, filename) per file
    (reference maestro_dataset_test.py:30-74; fixed 10 s offset)."""

    OFFSET_SECONDS = 10.0

    def __init__(self, args, *rest, **kw):
        dset = args.dset
        self.path = str(dset.path)
        years = set(int(y) for y in dset.get("years_test", []))
        self.num_samples = int(dset.test.get("num_samples", 4))
        self.seg_len = int(args.exp.audio_len * args.exp.get("resample_factor", 1))
        meta = _load_metadata(self.path)
        files = [os.path.join(self.path, r["audio_filename"])
                 for r in meta
                 if r.get("split") == "test"
                 and (not years or int(r["year"]) in years)]
        self.files = files[: self.num_samples]

    def __len__(self) -> int:
        return len(self.files)

    def __iter__(self):
        for f in self.files:
            n, fs, _ = audio_io.info(f)
            start = min(int(self.OFFSET_SECONDS * fs), max(n - self.seg_len, 0))
            x, fs = audio_io.read(f, start, self.seg_len)
            if x.shape[-1] < self.seg_len:
                x = np.pad(x, (0, self.seg_len - x.shape[-1]))
            yield x, fs, os.path.basename(f)
