"""Mask-providing test dataset for the short-gaps evaluation.

The reference's shortgaps mode *requires* a dataset yielding
(original, mask, fs, filename) tuples (tester_inpainting.py:443) but the repo
never shipped that loader (SURVEY.md §2.8). This framework provides it: wav
files with sibling per-file masks as .npy (bool/float [T]) or MATLAB .mat
(any 0/1 vector variable), matched by stem.
"""
from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from aid_tpu.data import audio_io


def _load_mask(path: str, length: int) -> np.ndarray:
    if path.endswith(".npy"):
        m = np.load(path)
    elif path.endswith(".mat"):
        import scipy.io
        mat = scipy.io.loadmat(path)
        arrays = [v for k, v in mat.items() if not k.startswith("__")]
        if not arrays:
            raise ValueError(f"no mask variable in {path}")
        m = arrays[0]
    else:
        raise ValueError(f"unsupported mask format: {path}")
    m = np.asarray(m).astype(np.float32).reshape(-1)
    if m.shape[0] < length:
        m = np.pad(m, (0, length - m.shape[0]), constant_values=1.0)
    return m[:length]


class MaskedAudioDatasetTest:
    """Finite test set: (audio, mask, fs, filename)."""

    def __init__(self, args, *rest, **kw):
        test = args.dset.test
        self.path = str(test.get("path", args.dset.path))
        self.mask_path = str(test.get("mask_path", self.path))
        self.num_samples = int(test.get("num_samples", 4))
        self.seg_len = int(args.exp.audio_len
                           * args.exp.get("resample_factor", 1))
        self.files = sorted(glob.glob(os.path.join(self.path, "**", "*.wav"),
                                      recursive=True))[: self.num_samples]
        if not self.files:
            raise FileNotFoundError(f"no wav files under {self.path}")

    def _find_mask(self, stem: str) -> Optional[str]:
        for ext in (".npy", ".mat"):
            cands = glob.glob(os.path.join(self.mask_path, "**", stem + ext),
                              recursive=True)
            if cands:
                return cands[0]
        return None

    def __len__(self):
        return len(self.files)

    def __iter__(self):
        for f in self.files:
            x, fs = audio_io.read(f, 0, self.seg_len)
            if x.shape[-1] < self.seg_len:
                x = np.pad(x, (0, self.seg_len - x.shape[-1]))
            stem = os.path.splitext(os.path.basename(f))[0]
            mp = self._find_mask(stem)
            if mp is None:
                raise FileNotFoundError(
                    f"no mask (.npy/.mat) named {stem}.* under {self.mask_path}")
            mask = _load_mask(mp, self.seg_len)
            yield x, mask, fs, os.path.basename(f)
