"""Objective audio metrics: LSD, SNR, spectral convergence.

The reference repo computes no metrics in-code (quality numbers live in the
JAES paper; SURVEY.md §6) — evaluation there is listening-test preparation.
This framework closes that gap so inpainting quality is measurable in-repo:
LSD (log-spectral distance, the paper's headline objective metric), gap-SNR,
and spectral convergence, plus a helper that scores a tester output tree.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional

import numpy as np


def _stft_mag(x: np.ndarray, n_fft: int = 1024, hop: int = 256) -> np.ndarray:
    import jax.numpy as jnp
    from aid_tpu.ops import stft as stft_ops
    X = stft_ops.stft(jnp.asarray(x, jnp.float32)[None], n_fft, hop, n_fft)[0]
    # |X| on DEVICE: device-to-host of complex64 is unimplemented on the axon
    # TPU backend (f32 transfers fine), and the magnitude is all we need
    return np.asarray(jnp.abs(X))


def lsd(reference: np.ndarray, estimate: np.ndarray, n_fft: int = 1024,
        hop: int = 256, eps: float = 1e-8) -> float:
    """Log-spectral distance in dB (lower is better): mean over frames of the
    RMS over frequency of the log-power spectrum difference."""
    n = min(len(reference), len(estimate))
    R = _stft_mag(reference[:n], n_fft, hop)
    E = _stft_mag(estimate[:n], n_fft, hop)
    d = 10.0 * (np.log10(R ** 2 + eps) - np.log10(E ** 2 + eps))
    return float(np.mean(np.sqrt(np.mean(d ** 2, axis=0))))


def snr(reference: np.ndarray, estimate: np.ndarray,
        region: Optional[slice] = None) -> float:
    """Signal-to-noise ratio in dB, optionally restricted to a region
    (e.g. the inpainted gap)."""
    r = np.asarray(reference, np.float64).reshape(-1)
    e = np.asarray(estimate, np.float64).reshape(-1)[: len(r)]
    if region is not None:
        r, e = r[region], e[region]
    err = r - e
    return float(10.0 * np.log10((np.sum(r ** 2) + 1e-12)
                                 / (np.sum(err ** 2) + 1e-12)))


def spectral_convergence(reference: np.ndarray, estimate: np.ndarray,
                         n_fft: int = 1024, hop: int = 256) -> float:
    """||R| - |E||_F / ||R||_F (lower is better)."""
    n = min(len(reference), len(estimate))
    R = _stft_mag(reference[:n], n_fft, hop)
    E = _stft_mag(estimate[:n], n_fft, hop)
    return float(np.linalg.norm(R - E) / (np.linalg.norm(R) + 1e-12))


def score_directory(mode_dir: str, out_json: Optional[str] = None) -> Dict:
    """Score a tester output tree (original/ vs reconstructed/) and write
    metrics.json next to it."""
    from aid_tpu.data import audio_io
    orig_dir = os.path.join(mode_dir, "original")
    rec_dir = os.path.join(mode_dir, "reconstructed")
    results = {}
    for f in sorted(glob.glob(os.path.join(orig_dir, "*.wav"))):
        name = os.path.basename(f)
        rf = os.path.join(rec_dir, name)
        if not os.path.exists(rf):
            continue
        ref, _ = audio_io.read(f)
        est, _ = audio_io.read(rf)
        results[name] = {
            "lsd": lsd(ref, est),
            "snr": snr(ref, est),
            "spectral_convergence": spectral_convergence(ref, est),
        }
    if results:
        agg = {k: float(np.mean([v[k] for v in results.values()]))
               for k in ("lsd", "snr", "spectral_convergence")}
        results["__mean__"] = agg
    out_json = out_json or os.path.join(mode_dir, "metrics.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=1)
    return results
