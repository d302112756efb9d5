"""Generic audio-folder loaders (the MusicNet path).

Capability parity with reference datasets/audiofolder.py:30-99 (infinite
random-segment sampler over a wav directory, pad-wrap for short files) and
datasets/audiofolder_test.py:30-67 (first num_samples files, fixed chunk,
returns (audio, fs, filename)).
"""
from __future__ import annotations

import glob
import os
from typing import Iterator, Tuple

import numpy as np

from aid_tpu.data import audio_io
from aid_tpu.data.maestro import _process_seed


def _glob_audio(path: str):
    files = sorted(
        glob.glob(os.path.join(path, "**", "*.wav"), recursive=True))
    if not files:
        raise FileNotFoundError(f"no wav files under {path}")
    return files


class AudioFolderDataset:
    """Infinite train iterator yielding (segment [audio_len*rf], fs)."""

    def __init__(self, args, *rest, **kw):
        self.path = str(args.dset.path)
        self.overfit = bool(args.dset.get("overfit", False))
        self.seg_len = int(args.exp.audio_len
                           * args.exp.get("resample_factor", 1))
        self.seed = _process_seed(int(args.exp.get("seed", 42)))
        self.files = _glob_audio(self.path)

    def _read_padded(self, f: str, start: int) -> Tuple[np.ndarray, int]:
        x, fs = audio_io.read(f, start, self.seg_len)
        while x.shape[-1] < self.seg_len:  # pad-wrap short files
            extra, _ = audio_io.read(f, 0, self.seg_len - x.shape[-1])
            if extra.size == 0:
                extra = np.zeros(self.seg_len - x.shape[-1], np.float32)
            x = np.concatenate([x, extra])
        return x, fs

    def __iter__(self) -> Iterator[Tuple[np.ndarray, int]]:
        rng = np.random.default_rng(self.seed)
        if self.overfit:
            x, fs = self._read_padded(self.files[0], 0)
            while True:
                yield x, fs
        while True:
            f = self.files[rng.integers(len(self.files))]
            try:
                n, fs, _ = audio_io.info(f)
            except Exception:
                continue
            start = int(rng.integers(0, max(n - self.seg_len, 0) + 1))
            yield self._read_padded(f, start)


class AudioFolderDatasetTest:
    """Finite test set: (audio, fs, filename)."""

    def __init__(self, args, *rest, **kw):
        test = args.dset.test
        self.path = str(test.get("path", args.dset.path))
        self.num_samples = int(test.get("num_samples", 4))
        self.seg_len = int(args.exp.audio_len
                           * args.exp.get("resample_factor", 1))
        self.files = _glob_audio(self.path)[: self.num_samples]

    def __len__(self) -> int:
        return len(self.files)

    def __iter__(self):
        for f in self.files:
            x, fs = audio_io.read(f, 0, self.seg_len)
            if x.shape[-1] < self.seg_len:
                x = np.pad(x, (0, self.seg_len - x.shape[-1]))
            yield x, fs, os.path.basename(f)
