"""Independent naive NSGT witness for validating aid_tpu.ops.cqt.

Deliberately-naive second implementation of the painless octave CQT-NSGT,
written directly from the frame-theory equations (Velasco, Holighaus,
Dorfler, Grill, "Constructing an invertible constant-Q transform with
nonstationary Gabor frames"; Balazs et al., "Theory, implementation and
applications of nonstationary Gabor frames") with NONE of the production
implementation's machinery: no half-spectrum slicing, no slot folding, no
phase ramps, no residue-class concatenation, no custom VJPs. Analysis is a
dense per-band DFT sum over the band's support bins; synthesis is an
explicit dual-frame accumulation onto the full Ls-point spectrum.

Shared design inputs (resolution choices, not frame math): the FFT length Ls
and the per-octave temporal lengths M_j are taken from the production design
so coefficients are comparable coefficient-for-coefficient. Everything
derived from the equations — band center frequencies, support ranges, window
sampling, white normalization, the frame diagonal, and both transforms — is
recomputed here from scratch.

Equations implemented (real input x of length Ls, X = fft(x)):

  band frequencies   f_k = fmin * 2^(k/B),  fmin = (fs/2)/2^O,  k = 0..K-1
  band support       FFT bins nu in (f_{k-1}, f_{k+1}) (open interval in Hz)
  window             g_k[nu] = w((nu - f_k * Ls/fs) / ((f_{k+1} - f_{k-1}) * Ls/fs))
  white norm         a_k = M_k / sqrt(Ls * sum(g_k^2))   so that white noise of
                     variance s^2 gives coefficients of variance s^2
  analysis           c_k[n] = (1/M_k) * sum_nu X[nu] (a_k g_k)[nu]
                                         * exp(+2i pi n (nu - c_k) / M_k)
  frame diagonal     D[nu] = sum_k ((a_k g_k)[nu]^2 + (a_k g_k)[(-nu) mod Ls]^2)
                     (DC and Nyquist bands included — they are part of the
                     frame even though the network-facing transform omits them)
  synthesis          Y[nu] = sum_k fft_{M_k}(c_k)[(nu - c_k) mod M_k]
                                    * (a_k g_k)[nu] / D[nu]          (nu in supp)
                     y = ifft(Y + conj(Y[(-nu) mod Ls])).real

This file exists because the production CQT is the single untested link to
the reference's released checkpoints (the external ``cqt_nsgt_pytorch``
package the reference instantiates at
networks/unet_cqt_oct_with_projattention_adaLN_2.py:620 is not installable
offline): an equation-level second witness catches derivation or machinery
bugs that the implementation's self-consistency tests (roundtrip, tones,
VJP-vs-autodiff) cannot see.
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import numpy as np


def _window(kind, x: np.ndarray) -> np.ndarray:
    """Symmetric bump on [-1/2, 1/2], zero outside — sampled independently
    from the standard definitions (Hann; Kaiser via direct Bessel series)."""
    if isinstance(kind, (tuple, list)):
        name, beta = kind[0], float(kind[1])
    else:
        name, beta = kind, 0.0
    out = np.zeros_like(np.asarray(x, np.float64))
    inside = np.abs(x) <= 0.5
    xi = np.asarray(x, np.float64)[inside]
    if name == "hann":
        out[inside] = np.cos(np.pi * xi) ** 2  # == 0.5 + 0.5 cos(2 pi x)
    elif name == "kaiser":
        # I0 via its power series (independent of np.i0's implementation)
        def i0(z):
            term = np.ones_like(z)
            acc = np.ones_like(z)
            for m in range(1, 25):
                term = term * (z / (2.0 * m)) ** 2
                acc = acc + term
            return acc
        out[inside] = i0(beta * np.sqrt(1.0 - (2.0 * xi) ** 2)) / i0(
            np.asarray(beta))
    else:
        raise ValueError(kind)
    return out


class NaiveBand:
    def __init__(self, center_bin: int, bins: np.ndarray, win: np.ndarray,
                 M: int):
        self.center = center_bin   # integer FFT-bin index of the peak
        self.bins = bins           # integer FFT bins of the support (mod Ls)
        self.win = win             # normalized window samples on those bins
        self.M = M


def design(num_octs: int, bins_per_oct: int, fs: float, Ls: int,
           M_per_oct: Sequence[int], window) -> List[NaiveBand]:
    """Re-derive the K = num_octs*bins_per_oct octave bands from the
    geometric-frequency equations. Ls and M_per_oct (low->high octave) are
    shared resolution choices; all frame math is recomputed here."""
    O, B = num_octs, bins_per_oct
    nyq = fs / 2.0
    fmin = nyq / 2.0 ** O
    K = O * B
    to_bin = Ls / fs
    # flanking frequencies f_{-1} .. f_K in Hz; top edge clipped to Nyquist
    f = fmin * 2.0 ** (np.arange(-1, K + 1, dtype=np.float64) / B)
    f[-1] = min(f[-1], nyq)

    bands: List[NaiveBand] = []
    for k in range(K):
        lo_hz, c_hz, hi_hz = f[k], f[k + 1], f[k + 2]
        lo = int(math.ceil(lo_hz * to_bin))
        hi = int(math.floor(hi_hz * to_bin))
        bins = np.arange(lo, hi + 1, dtype=np.int64)
        x = (bins - c_hz * to_bin) / ((hi_hz - lo_hz) * to_bin)
        win = _window(window, x)
        M = int(M_per_oct[k // B])
        a = M / math.sqrt(Ls * float(np.sum(win ** 2)))
        bands.append(NaiveBand(int(round(c_hz * to_bin)), bins, win * a, M))
    return bands


def _dc_nyq_bands(num_octs: int, bins_per_oct: int, fs: float, Ls: int,
                  window) -> Tuple[NaiveBand, NaiveBand]:
    """The DC and Nyquist frame completions (needed only for the frame
    diagonal D; the network-facing transform never emits them)."""
    O, B = num_octs, bins_per_oct
    nyq = fs / 2.0
    fmin = nyq / 2.0 ** O
    to_bin = Ls / fs
    K = O * B
    f = fmin * 2.0 ** (np.arange(-1, K + 1, dtype=np.float64) / B)
    f[-1] = min(f[-1], nyq)

    # DC: centered at bin 0, support the open interval (-f_0, f_0)
    b0 = f[1] * to_bin
    bins = np.arange(int(math.ceil(-b0)) + 1, int(math.floor(b0) - 1) + 1,
                     dtype=np.int64)
    win = _window(window, bins / (2.0 * b0))
    M = 1 << (len(bins) - 1).bit_length()
    a = M / math.sqrt(Ls * float(np.sum(win ** 2)))
    dc = NaiveBand(0, bins % Ls, win * a, M)

    # Nyquist: centered at Ls/2, support (bin(f_{K-1}), Ls - bin(f_{K-1}))
    c = Ls // 2
    bK = f[K] * to_bin
    bins = np.arange(int(math.ceil(bK)) + 1,
                     int(math.floor(2 * c - bK) - 1) + 1, dtype=np.int64)
    win = _window(window, (bins - c) / (2.0 * (c - bK)))
    M = 1 << (len(bins) - 1).bit_length()
    a = M / math.sqrt(Ls * float(np.sum(win ** 2)))
    nyqb = NaiveBand(c, bins % Ls, win * a, M)
    return dc, nyqb


def frame_diagonal(bands: List[NaiveBand], Ls: int) -> np.ndarray:
    D = np.zeros(Ls, np.float64)
    for bd in bands:
        pos = bd.bins % Ls
        D[pos] += bd.win ** 2
        D[(-pos) % Ls] += bd.win ** 2
    return D


def naive_fwd(x: np.ndarray, bands: List[NaiveBand],
              Ls: int) -> List[np.ndarray]:
    """Dense per-band DFT analysis: c_k[n] = (1/M) sum_nu X[nu] g[nu]
    exp(2i pi n (nu - c_k) / M). Returns one [bins_per_oct_group...] array
    per band (caller groups into octaves)."""
    x = np.asarray(x, np.float64).reshape(-1)
    assert len(x) <= Ls
    X = np.fft.fft(np.pad(x, (0, Ls - len(x))))
    out = []
    for bd in bands:
        n = np.arange(bd.M)
        # [M, support] complex exponential matrix — the naive direct sum
        E = np.exp(2j * np.pi * np.outer(n, (bd.bins - bd.center)) / bd.M)
        out.append(E @ (X[bd.bins % Ls] * bd.win) / bd.M)
    return out


def naive_bwd(coeffs: List[np.ndarray], bands: List[NaiveBand], Ls: int,
              D: np.ndarray) -> np.ndarray:
    """Explicit dual-frame synthesis accumulated bin-by-bin on the full
    spectrum, then hermitian completion and one inverse FFT."""
    Y = np.zeros(Ls, np.complex128)
    for c, bd in zip(coeffs, bands):
        U = np.fft.fft(np.asarray(c, np.complex128))
        pos = bd.bins % Ls
        Y[pos] += U[(bd.bins - bd.center) % bd.M] * bd.win / D[pos]
    Z = Y + np.conj(Y[(-np.arange(Ls)) % Ls])
    return np.fft.ifft(Z).real


def witness_transforms(num_octs: int, bins_per_oct: int, fs: float,
                       audio_len: int, Ls: int, M_per_oct: Sequence[int],
                       window):
    """Build the full witness: returns (fwd, bwd) callables shaped like the
    production API — fwd(x) -> list per octave of [bins_per_oct, M_j],
    bwd(list) -> real [Ls]."""
    bands = design(num_octs, bins_per_oct, fs, Ls, M_per_oct, window)
    dc, nyq = _dc_nyq_bands(num_octs, bins_per_oct, fs, Ls, window)
    D = frame_diagonal(bands + [dc, nyq], Ls)

    B = bins_per_oct

    def fwd(x: np.ndarray) -> List[np.ndarray]:
        flat = naive_fwd(x, bands, Ls)
        return [np.stack(flat[j * B:(j + 1) * B]) for j in range(num_octs)]

    def bwd(octs: List[np.ndarray]) -> np.ndarray:
        flat = [octs[j][b] for j in range(num_octs) for b in range(B)]
        return naive_bwd(flat, bands, Ls, D)

    return fwd, bwd
