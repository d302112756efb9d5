"""Degradation operators for posterior sampling, as pure functions.

Capability parity with the reference's degradation family: time-domain masking
(edm_sampler_inpainting.py:264-269,327-346), STFT masking (:271-290,348-364),
lowpass/decimation for bandwidth extension (edm_sampler.py:266-305), hard
clipping (edm_sampler.py:359-384), STFT magnitude for phase retrieval
(edm_sampler.py:308-336) and compressive-sensing subsampling
(edm_sampler.py:337-357). Each builder returns a jit-safe closure x -> y.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from aid_tpu.ops import stft as stft_ops


# ------------------------------------------------------------------ masking

def time_mask(mask: jnp.ndarray) -> Callable:
    """Inpainting degradation: pointwise mask multiply."""
    return lambda x: mask * x


def make_smooth_mask(mask: np.ndarray, hann_size: int) -> np.ndarray:
    """Hann cross-fades on the OBSERVED side of each gap edge
    (reference prepare_smooth_mask, edm_sampler_inpainting.py:302-325):
    the gap itself stays zero; the ``hann_size`` observed samples before a
    1->0 transition ramp down, and after a 0->1 transition ramp up.
    Host-side (numpy): masks are data preparation, computed outside jit.
    """
    mask = np.asarray(mask)
    batched = mask.ndim == 2
    m = mask[0] if batched else mask
    n = len(m)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(2 * hann_size) / (2 * hann_size))
    out = m.astype(np.float64).copy()
    edges = np.flatnonzero(np.diff(m) != 0) + 1
    for i in edges:
        if m[i] == 0:      # entering a gap: fade-out before it
            lo = max(0, i - hann_size)
            out[lo:i] = hann[hann_size:][hann_size - (i - lo):]
        else:              # leaving a gap: fade-in after it
            hi = min(n, i + hann_size)
            out[i:hi] = hann[: hi - i]
    out = out.astype(np.float32)
    return np.broadcast_to(out, mask.shape) if batched else out


def inpainting_projector(y_masked: jnp.ndarray, smooth_mask: jnp.ndarray) -> Callable:
    """Data-consistency projection m*y + (1-m)*x (reference :343)."""
    return lambda x: smooth_mask * y_masked + (1.0 - smooth_mask) * x


# --------------------------------------------------------------- STFT masking

def spectral_mask(mask_FT: jnp.ndarray, stft_cfg) -> Callable:
    """Apply a (F, frames) STFT-domain mask and resynthesize
    (reference apply_spectral_mask, edm_sampler_inpainting.py:271-290)."""
    n_fft = int(stft_cfg.n_fft)
    hop = int(stft_cfg.hop_length)
    win = int(stft_cfg.win_length)

    def apply(x):
        T = x.shape[-1]
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_fft - T % n_fft)])
        X = stft_ops.stft(xp, n_fft, hop, win)
        Xm = X * mask_FT
        y = stft_ops.istft(Xm, n_fft, hop, win, length=xp.shape[-1])
        return y[..., :T]

    return apply


def spectral_projector(y: jnp.ndarray, apply_mask: Callable) -> Callable:
    """Replacement projection for linear STFT degradations: y + x - A(x)
    (reference :362)."""
    return lambda x: y + x - apply_mask(x)


def stft_magnitude(stft_cfg, spec_type: str = "linear") -> Callable:
    """Phase-retrieval degradation |STFT(x)| (reference SamplerPhaseRetrieval,
    edm_sampler.py:308-336)."""
    n_fft = int(stft_cfg.n_fft)
    hop = int(stft_cfg.hop_length)
    win = int(stft_cfg.win_length)

    def apply(x):
        return jnp.abs(stft_ops.stft(x, n_fft, hop, win))

    return apply


# ------------------------------------------------------------------ lowpass

def firwin_lowpass(order: int, fc: float, fs: float, beta: float = 6.76) -> Callable:
    """FIR lowpass via scipy.signal.firwin taps, applied as a same-length conv
    (reference applies torchaudio-style FIR in predict_bwe, edm_sampler.py:276-301)."""
    taps = scipy.signal.firwin(numtaps=order + 1, cutoff=fc, fs=fs,
                               window=("kaiser", beta)).astype(np.float32)
    w = jnp.asarray(taps)[:, None, None]
    pad = len(taps) // 2

    def apply(x):
        shape = x.shape
        z = x.reshape(-1, shape[-1], 1)
        z = jnp.pad(z, ((0, 0), (pad, len(taps) - 1 - pad), (0, 0)))
        y = jax.lax.conv_general_dilated(z, w, (1,), "VALID",
                                         dimension_numbers=("NWC", "WIO", "NWC"))
        return y.reshape(shape)

    return apply


def iir_lowpass(kind: str, order: int, fc: float, fs: float,
                ripple: float = 0.05) -> Callable:
    """IIR lowpass (cheby1 / biquad-butter) run as a lax.scan recursion.
    Sequential by nature; only used to build degraded observations, not in the
    sampler hot loop."""
    if kind == "cheby1":
        b, a = scipy.signal.cheby1(order, ripple, fc, fs=fs, btype="low")
    else:
        b, a = scipy.signal.butter(order, fc, fs=fs, btype="low")
    b = jnp.asarray(b / a[0], jnp.float32)
    a = jnp.asarray(a / a[0], jnp.float32)
    na, nb = len(a), len(b)

    def apply(x):
        shape = x.shape
        z = x.reshape(-1, shape[-1])

        def step(carry, xt):
            xs, ys = carry  # xs: last nb inputs (newest first), ys: last na-1 outputs
            xs = jnp.concatenate([xt[:, None], xs[:, :-1]], axis=1)
            yt = jnp.einsum("t,bt->b", b, xs) - jnp.einsum("t,bt->b", a[1:], ys)
            ys = jnp.concatenate([yt[:, None], ys[:, :-1]], axis=1)
            return (xs, ys), yt

        init = (jnp.zeros((z.shape[0], nb)), jnp.zeros((z.shape[0], na - 1)))
        _, y = jax.lax.scan(step, init, z.T)
        return y.T.reshape(shape)

    return apply


def decimate(factor: int) -> Tuple[Callable, Callable]:
    """Subsample/zero-stuff pair for decimation BWE (edm_sampler.py:290-297)."""
    def down(x):
        return x[..., ::factor]

    def up(x):
        out = jnp.zeros(x.shape[:-1] + (x.shape[-1] * factor,), x.dtype)
        return out.at[..., ::factor].set(x)

    return down, up


# ------------------------------------------------------------------ clipping

def hard_clip(clip_value: float) -> Callable:
    """Declipping degradation (reference SamplerDeclipping, edm_sampler.py:359-384)."""
    return lambda x: jnp.clip(x, -clip_value, clip_value)


def clip_value_from_sdr(x: jnp.ndarray, sdr_db: float) -> jnp.ndarray:
    """Find the clip level giving the requested SDR on x (bisection, host-free)."""
    def sdr_of(cv):
        err = x - jnp.clip(x, -cv, cv)
        return 10.0 * jnp.log10(jnp.sum(x ** 2) / (jnp.sum(err ** 2) + 1e-12))

    lo = jnp.asarray(1e-4)
    hi = jnp.max(jnp.abs(x))

    def body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        too_high = sdr_of(mid) > sdr_db
        return jnp.where(too_high, lo, mid), jnp.where(too_high, mid, hi)

    lo, hi = jax.lax.fori_loop(0, 40, body, (lo, hi))
    return 0.5 * (lo + hi)


# --------------------------------------------------------------- comp. sensing

def compsens_mask(key: jax.Array, shape, percentage: float) -> jnp.ndarray:
    """Random sample-domain mask keeping `percentage`%% of samples
    (reference SamplerCompSens, edm_sampler.py:337-357)."""
    u = jax.random.uniform(key, shape)
    return (u < percentage / 100.0).astype(jnp.float32)
