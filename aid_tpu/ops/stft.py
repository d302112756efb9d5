"""STFT / iSTFT in JAX with torch-compatible semantics.

The reference leans on ``torch.stft``/``torch.istft`` for spectrogram masking
(testing/edm_sampler_inpainting.py:271-290, testing/tester_inpainting.py:299-323)
and logging (utils/logging.py:20-55). Conventions matched: center=True with
reflect padding, one-sided spectrum, Hann window, least-squares (window-square
overlap-add) inverse. Implemented as framed matmul-free ops: frame -> window ->
rfft, all static shapes, vmappable and differentiable.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann (torch.hann_window default periodic=True)."""
    n = np.arange(win_length)
    return jnp.asarray(0.5 - 0.5 * np.cos(2 * np.pi * n / win_length), dtype)


def _frame(x: jnp.ndarray, frame_len: int, hop: int) -> jnp.ndarray:
    T = x.shape[-1]
    n_frames = 1 + (T - frame_len) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_len)[None, :])
    return x[..., idx]  # [..., n_frames, frame_len]


def stft(x: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
         window: Optional[jnp.ndarray] = None, center: bool = True) -> jnp.ndarray:
    """x [..., T] -> complex [..., F=n_fft//2+1, frames]."""
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(window, (pad, n_fft - win_length - pad))
    if center:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)],
                    mode="reflect")
    frames = _frame(x, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.moveaxis(spec, -1, -2)  # [..., F, frames]


def istft(spec: jnp.ndarray, n_fft: int, hop_length: int, win_length: int,
          window: Optional[jnp.ndarray] = None, length: Optional[int] = None,
          center: bool = True) -> jnp.ndarray:
    """Least-squares inverse: overlap-add with window-square normalization."""
    if window is None:
        window = hann_window(win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(window, (pad, n_fft - win_length - pad))
    frames = jnp.fft.irfft(jnp.moveaxis(spec, -2, -1), n=n_fft, axis=-1) * window
    n_frames = frames.shape[-2]
    total = n_fft + hop_length * (n_frames - 1)
    lead = frames.shape[:-2]

    pos = np.arange(n_frames) * hop_length
    idx = pos[:, None] + np.arange(n_fft)[None, :]          # [frames, n_fft]
    y = jnp.zeros(lead + (total,), frames.dtype)
    y = y.at[..., idx].add(frames)
    wsq = jnp.zeros((total,), window.dtype).at[idx].add(
        jnp.broadcast_to(window ** 2, (n_frames, n_fft)))
    y = y / jnp.maximum(wsq, 1e-11)
    if center:
        y = y[..., n_fft // 2: total - n_fft // 2]
    if length is not None:
        y = y[..., :length]
    return y


def spectrogram_db(x: jnp.ndarray, n_fft: int = 1024, hop_length: int = 256,
                   win_length: int = 1024, floor_db: float = -80.0) -> jnp.ndarray:
    """Magnitude spectrogram in dB (for logging/plots)."""
    s = jnp.abs(stft(x, n_fft, hop_length, win_length))
    db = 20.0 * jnp.log10(jnp.maximum(s, 1e-8))
    return jnp.maximum(db - jnp.max(db), floor_db)
