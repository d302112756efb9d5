"""Invertible octave-banded Constant-Q transform (CQT-NSGT) in JAX.

TPU-native re-design of the DSP core the reference delegates to the external
``cqt_nsgt_pytorch`` package (reference networks/unet_cqt_oct_with_projattention_adaLN_2.py:9
imports it, :620 instantiates ``CQT_nsgt(num_octs, bins_per_oct, mode="oct",
window, fs, audio_len, ...)``; used at :743 ``.fwd``, :841 ``.bwd``, and
diff_params/edm.py:184 / testing/edm_sampler_inpainting.py:63 ``.apply_hpf_DC``).

Mathematical basis: painless nonstationary Gabor frames (Balazs, Dorfler,
Holighaus et al., "Theory, implementation and applications of nonstationary
Gabor frames"; Velasco et al., "Constructing an invertible constant-Q transform
with nonstationary Gabor frames"). Frequency-side windows g_k are compactly
supported bumps centered at geometrically spaced frequencies
f_k = fmin * 2^(k/B), fmin = (fs/2) / 2^num_octs. Band k's coefficients are

    c_k = ifft_{M_k}( X[support_k] * g_k )        with X = fft(x),

where M_k >= |support_k| (painless case). All bins in one octave share the same
time resolution M_j, and M_j halves per octave downward — so the transform is a
list of dense rectangular [bins_per_oct, M_j] complex arrays, one per octave,
exactly the ragged-but-static structure the octave U-Net consumes
(reference networks:743-830).

Perfect reconstruction (for real signals, positive-frequency bands only):
with U_k = fft(c_k) = X*g_k (painless) the synthesis

    Y[f] = sum_k U_k[f] w_k[f] + conj( sum_k U_k[-f] w_k[-f] ),
    w_k = g_k / D,   D[f] = sum_k ( g_k[f]^2 + g_k[(-f) mod Ls]^2 ),

satisfies Y = X exactly wherever D > 0 (covered [0, Nyquist] including the DC
and Nyquist bands). The DC and Nyquist bands are carried separately
("complete" variants) and are *excluded* from the network-facing fwd/bwd, which
is why the reference applies ``apply_hpf_DC`` to targets (edm.py:181-186) and
sampler outputs (edm_sampler_inpainting.py:62-63): here that operator reduces to
one precomputed real frequency mask (painless analysis+synthesis over a band
subset is diagonal in frequency), i.e. a single rfft -> mask -> irfft.

TPU-first design notes:
  * All index arrays and window matrices are static (precomputed with numpy at
    design time) — fwd is fft + gather + multiply + per-octave ifft; bwd is
    per-octave fft + scatter-add + ifft. No data-dependent shapes, everything
    jit/scan/grad friendly.
  * Internal FFT length Ls pads audio_len up to a 2^(num_octs+5)-multiple with a
    {2,3,5,7}-smooth multiplier, keeping XLA's FFT fast and making every octave
    length M_j an exact power-of-two multiple of the deepest one (the U-Net's
    2x time up/downsampling relies on M_{j+1} = 2 M_j; cf. reference networks:18
    "powers of 2 for the time sizes").
  * Coefficients use "white" normalization: each band scaled so white noise of
    variance s^2 yields coefficients of variance s^2 (keeps activations on the
    same scale as the waveform, so sigma_data stays meaningful inside the net).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _np_dtype(dtype) -> np.dtype:
    return np.dtype(jnp.dtype(dtype).name)


def _next_smooth(n: int) -> int:
    """Smallest integer >= n whose prime factors are all in {2,3,5,7}."""
    def is_smooth(m: int) -> bool:
        for p in (2, 3, 5, 7):
            while m % p == 0:
                m //= p
        return m == 1

    while not is_smooth(n):
        n += 1
    return n


def _window(kind, x: np.ndarray) -> np.ndarray:
    """Symmetric window on x in [-0.5, 0.5]; zero outside."""
    inside = np.abs(x) <= 0.5
    if isinstance(kind, (tuple, list)):
        name, beta = kind[0], float(kind[1])
    else:
        name, beta = kind, 0.0
    if name == "hann":
        w = 0.5 + 0.5 * np.cos(2 * np.pi * x)
    elif name == "kaiser":
        arg = np.clip(1.0 - (2.0 * x) ** 2, 0.0, None)
        w = np.i0(beta * np.sqrt(arg)) / np.i0(beta)
    elif name == "blackharr":
        w = (0.35872 + 0.48832 * np.cos(2 * np.pi * x)
             + 0.14128 * np.cos(4 * np.pi * x) + 0.01168 * np.cos(6 * np.pi * x))
    else:
        raise ValueError(f"unknown window {kind!r}")
    return np.where(inside, w, 0.0)


@dataclasses.dataclass(frozen=True)
class _Band:
    center: int          # FFT-bin index of the window peak (mod Ls)
    offsets: np.ndarray  # int offsets o (signed); support positions are (center+o) mod Ls
    win: np.ndarray      # scaled analysis window a_k sampled at offsets
    M: int               # temporal length (ifft size) for this band


class CQT:
    """Octave-mode invertible CQT. API mirrors the reference's CQT_nsgt usage.

    fwd(x[..., T])  -> list (low octave -> high octave) of complex [..., bins, M_j]
    bwd(list)       -> [..., Ls] real (caller crops to T, cf. reference networks:843)
    apply_hpf_DC(x) -> x band-limited to the octave bands (DC + Nyquist removed)
    """

    def __init__(
        self,
        num_octs: int,
        bins_per_oct: int,
        fs: float,
        audio_len: int,
        window="hann",
        dtype=jnp.float32,
    ):
        self.num_octs = num_octs
        self.bins_per_oct = bins_per_oct
        self.fs = float(fs)
        self.audio_len = int(audio_len)
        self.dtype = dtype
        ctype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128

        O, B = num_octs, bins_per_oct
        base = 2 ** (O + 5)
        mult = _next_smooth(max(1, math.ceil(audio_len / base)))
        Ls = mult * base
        self.Ls = Ls

        nyq_hz = self.fs / 2.0
        fmin = nyq_hz / (2.0 ** O)
        K = O * B
        # Geometric bin frequencies + flanking edges (f_{-1}, f_K) in Hz.
        f = fmin * 2.0 ** (np.arange(-1, K + 1) / B)  # length K+2; f[0]=f_{-1}
        f[-1] = min(f[-1], nyq_hz)
        to_bin = Ls / self.fs  # Hz -> fractional FFT bin

        bands: List[_Band] = []
        for k in range(K):
            lo_hz, c_hz, hi_hz = f[k], f[k + 1], f[k + 2]
            c = int(round(c_hz * to_bin))
            lo = int(math.ceil(lo_hz * to_bin))
            hi = int(math.floor(hi_hz * to_bin))
            offs = np.arange(lo, hi + 1) - c
            x = (np.arange(lo, hi + 1) - c_hz * to_bin) / ((hi_hz - lo_hz) * to_bin)
            bands.append(_Band(c, offs, _window(window, x), 0))

        # Per-octave time resolution: power of two, halving per octave down.
        need_top = 1
        for j in range(O):
            max_lg = max(len(bands[j * B + b].offsets) for b in range(B))
            need_top = max(need_top, max_lg * 2 ** (O - 1 - j))
        M_top = 1 << (need_top - 1).bit_length()
        self.M = [M_top // 2 ** (O - 1 - j) for j in range(O)]  # per octave, low->high
        for j in range(O):
            for b in range(B):
                k = j * B + b
                assert len(bands[k].offsets) <= self.M[j], "painless condition violated"
                bands[k] = dataclasses.replace(bands[k], M=self.M[j])

        # DC band: centered at 0, support (-f_0, f_0).
        b0 = f[1] * to_bin
        lo, hi = int(math.ceil(-b0)) + 1, int(math.floor(b0)) - 1
        offs = np.arange(lo, hi + 1)
        dc_win = _window(window, offs / (2.0 * b0))
        M_dc = 1 << (len(offs) - 1).bit_length()
        dc = _Band(0, offs, dc_win, M_dc)

        # Nyquist band: centered at Ls/2, support (bin(f_{K-1}), Ls - bin(f_{K-1})).
        c_nyq = Ls // 2
        bK = f[K] * to_bin  # last bin center in fractional bins
        half = c_nyq - bK
        lo, hi = int(math.ceil(bK)) + 1, int(math.floor(2 * c_nyq - bK)) - 1
        offs = np.arange(lo, hi + 1) - c_nyq
        nyq_win = _window(window, offs / (2.0 * half))
        M_nyq = 1 << (len(offs) - 1).bit_length()
        nyq = _Band(c_nyq, offs, nyq_win, M_nyq)

        all_bands = [dc] + bands + [nyq]

        # "White" normalization: scale each band so white noise keeps its variance.
        #   E|c|^2 = (Ls / M^2) * sum(g^2) * s^2  ->  want sum(a^2) = M^2 / Ls.
        for i, bd in enumerate(all_bands):
            s = bd.M / math.sqrt(Ls * float(np.sum(bd.win ** 2)))
            all_bands[i] = dataclasses.replace(bd, win=bd.win * s)
        dc, bands, nyq = all_bands[0], all_bands[1:-1], all_bands[-1]

        # Frame diagonal D over the full grid (direct + mirrored contributions).
        D = np.zeros(Ls)
        for bd in all_bands:
            pos = (bd.center + bd.offsets) % Ls
            D[pos] += bd.win ** 2
            D[(-pos) % Ls] += bd.win ** 2
        self._D = D
        cov = D[: Ls // 2 + 1]
        assert np.all(cov > 1e-10), "frame not invertible: uncovered frequencies"

        # Static per-octave gather indices / window matrices (analysis + synthesis).
        def pack(group: Sequence[_Band], M: int):
            n = len(group)
            idx = np.zeros((n, M), np.int32)
            wa = np.zeros((n, M), np.float64)
            ws = np.zeros((n, M), np.float64)
            for b, bd in enumerate(group):
                slots = bd.offsets % M
                assert len(np.unique(slots)) == len(slots), "painless violated (fold)"
                pos = (bd.center + bd.offsets) % Ls
                idx[b, slots] = pos
                wa[b, slots] = bd.win
                ws[b, slots] = bd.win / D[pos]
            return idx, wa, ws

        self._oct_idx, self._oct_wa, self._oct_ws = [], [], []
        for j in range(O):
            idx, wa, ws = pack(bands[j * B:(j + 1) * B], self.M[j])
            self._oct_idx.append(np.asarray(idx, np.int32))
            self._oct_wa.append(np.asarray(wa, _np_dtype(dtype)))
            self._oct_ws.append(np.asarray(ws, _np_dtype(dtype)))
        idx, wa, ws = pack([dc], dc.M)
        self._dc = (np.asarray(idx, np.int32), np.asarray(wa, _np_dtype(dtype)),
                    np.asarray(ws, _np_dtype(dtype)), dc.M)
        idx, wa, ws = pack([nyq], nyq.M)
        self._nyq = (np.asarray(idx, np.int32), np.asarray(wa, _np_dtype(dtype)),
                     np.asarray(ws, _np_dtype(dtype)), nyq.M)

        # Gather/scatter-free hot-path tables. TPU gathers are element-granular
        # and slow, and scatter-adds serialize — but every NSGT band support is
        # a CONTIGUOUS run of FFT bins, so:
        #   analysis  = per band one STATIC slice of the half spectrum,
        #               windowed, ifft'd, then multiplied by a static phase
        #               ramp (folds the slot roll: ifft(roll(V, r)) =
        #               phase_r * ifft(V));
        #   synthesis = per band fft -> window -> CROP to its support, then the
        #               mod-3 residue classes (support-disjoint, painless
        #               windows overlap adjacent bands only) are rebuilt by
        #               pure CONCATENATION with static zero gaps; 3 class
        #               segments sum into the octave span.
        # Everything static; no gather/scatter anywhere, forward or VJP.
        H = Ls // 2 + 1
        self._seg: List[dict] = []
        for j in range(O):
            M = self.M[j]
            grp = bands[j * B:(j + 1) * B]
            fdt = _np_dtype(dtype)
            starts = np.zeros(B, np.int64)
            lens = np.zeros(B, np.int64)
            win_a = np.zeros((B, M), fdt)
            win_s = np.zeros((B, M), fdt)
            phase = np.zeros((B, M), np.complex64)
            for b, bd in enumerate(grp):
                pos = bd.center + bd.offsets   # contiguous ascending, no wrap
                assert np.all(np.diff(pos) == 1)
                assert pos[0] >= 1 and pos[-1] <= Ls // 2, \
                    "octave band support escapes the half spectrum"
                L = len(pos)
                starts[b], lens[b] = pos[0], L
                win_a[b, :L] = bd.win
                win_s[b, :L] = bd.win / D[pos]
                r = int((pos[0] - bd.center) % M)
                n = np.arange(M)
                phase[b] = np.exp(2j * np.pi * r * n / M)
            lo = int(starts.min())
            hi = int((starts + lens).max() - 1)
            classes = []
            for g in range(3):
                entries = [(int(starts[b]), int(lens[b]), b)
                           for b in range(g, B, 3)]
                entries.sort()
                for (s0, l0, _), (s1, _, _) in zip(entries, entries[1:]):
                    assert s0 + l0 <= s1, f"class-{g} overlap in octave {j}"
                classes.append(entries)
            self._seg.append(dict(
                starts=starts, lens=lens, lo=lo, hi=hi, classes=classes,
                win_a=win_a, win_s=win_s, phase=phase,
                phase_c=np.conj(phase),
                win_a_adj=(win_a * (Ls / (2.0 * M))).astype(fdt),
                win_s_adj=(win_s * (2.0 * M / Ls)).astype(fdt)))
        self._H = H

        # apply_hpf_DC: band-subset analysis+synthesis is a diagonal frequency
        # mask in the painless case; precompute it on the rfft half-spectrum.
        mask = np.zeros(Ls)
        for bd in bands:
            pos = (bd.center + bd.offsets) % Ls
            mask[pos] += bd.win ** 2 / D[pos]
            mpos = (-pos) % Ls
            mask[mpos] += bd.win ** 2 / D[mpos]
        # tables stay HOST numpy: under jit they embed as HLO constants with
        # no device round-trip (the axon tunnel cannot d2h some dtypes), and
        # compile requests stay small
        self._hpf_mask = np.asarray(mask[: Ls // 2 + 1], _np_dtype(dtype))

        self._mirror = np.asarray((-np.arange(Ls)) % Ls, np.int32)
        self._ctype = ctype

    # ------------------------------------------------------------------ fwd
    def _pad(self, x: jnp.ndarray) -> jnp.ndarray:
        T = x.shape[-1]
        if T > self.Ls:
            raise ValueError(
                f"input length {T} exceeds the designed transform length Ls={self.Ls} "
                f"(audio_len={self.audio_len}); build a CQT for the longer signal")
        if T < self.Ls:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, self.Ls - T)]
            x = jnp.pad(x, pad)
        return x

    # --- gather/scatter-free half-spectrum kernels (the hot path) ---

    def _slice_bands(self, X: jnp.ndarray, j: int, win: np.ndarray) -> jnp.ndarray:
        """X [..., H] -> windowed band spectra [..., bins, M_j] via static
        contiguous slices (one per band)."""
        st = self._seg[j]
        M = self.M[j]
        sl = []
        for s in st["starts"]:
            s = int(s)
            n = min(M, self._H - s)   # top bands: M-slice may overrun H;
            t = jax.lax.slice_in_dim(X, s, s + n, axis=-1)
            if n < M:                 # window is zero beyond the support
                t = jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, M - n)])
            sl.append(t)
        return jnp.stack(sl, axis=-2) * win

    def _concat_bands(self, U: jnp.ndarray, j: int) -> jnp.ndarray:
        """Weighted band spectra [..., bins, M_j] -> octave span segment
        [..., W_j] by residue-class concatenation (no scatter)."""
        st = self._seg[j]
        lead = U.shape[:-2]
        out = None
        for entries in st["classes"]:
            pieces = []
            cursor = st["lo"]
            for s, L, b in entries:
                if s > cursor:
                    pieces.append(jnp.zeros(lead + (s - cursor,), U.dtype))
                pieces.append(jax.lax.slice_in_dim(U[..., b, :], 0, L, axis=-1))
                cursor = s + L
            if cursor < st["hi"] + 1:
                pieces.append(jnp.zeros(lead + (st["hi"] + 1 - cursor,), U.dtype))
            seg = jnp.concatenate(pieces, axis=-1)
            out = seg if out is None else out + seg
        return out

    def _assemble_half(self, U_list: List[jnp.ndarray], adjoint: bool) -> jnp.ndarray:
        """Sum per-octave weighted band spectra into one half spectrum [..., H]."""
        lead = U_list[0].shape[:-2]
        half = jnp.zeros(lead + (self._H,), self._ctype)
        for j in range(self.num_octs):
            st = self._seg[j]
            seg = self._concat_bands(U_list[j], j)
            pad = [(0, 0)] * (half.ndim - 1) + [(st["lo"], self._H - st["hi"] - 1)]
            half = half + jnp.pad(seg, pad)
        return half

    def fwd(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        """Analysis. x: real [..., T<=Ls] -> list low->high octave of [..., bins, M_j].

        One rfft + per-octave (gather * window -> ifft). custom_vjp: the
        cotangent is assembled scatter-free (autodiff of the gather would
        otherwise emit a TPU scatter-add in every guidance backprop)."""
        return list(_fwd_oct(self, self._pad(x).astype(self.dtype)))

    def fwd_complete(self, x: jnp.ndarray):
        """Analysis including DC and Nyquist bands: (dc, octave_list, nyq)."""
        X = jnp.fft.fft(self._pad(x).astype(self.dtype))
        octs = []
        for j in range(self.num_octs):
            V = jnp.take(X, self._oct_idx[j], axis=-1) * self._oct_wa[j]
            octs.append(jnp.fft.ifft(V, axis=-1))
        dc = jnp.fft.ifft(jnp.take(X, self._dc[0], axis=-1) * self._dc[1], axis=-1)
        nyq = jnp.fft.ifft(jnp.take(X, self._nyq[0], axis=-1) * self._nyq[1], axis=-1)
        return dc, octs, nyq

    # ------------------------------------------------------------------ bwd
    def _accumulate(self, S, coeffs, idx, ws):
        # S is a float pair [..., Ls, 2]: complex scatter-add is unimplemented on
        # the TPU backend, so real/imag are accumulated as two f32 scatters.
        U = jnp.fft.fft(coeffs, axis=-1) * ws
        S = S.at[..., idx, 0].add(U.real)
        return S.at[..., idx, 1].add(U.imag)

    def _finish(self, S: jnp.ndarray) -> jnp.ndarray:
        Sc = jax.lax.complex(S[..., 0], S[..., 1])
        Z = Sc + jnp.conj(jnp.take(Sc, self._mirror, axis=-1))
        return jnp.fft.ifft(Z).real.astype(self.dtype)

    def bwd(self, coeffs: List[jnp.ndarray]) -> jnp.ndarray:
        """Synthesis from octave bands only -> real [..., Ls] (band-limited).

        Per-octave fft -> scatter-free assembly -> ONE irfft of the half
        spectrum (octave bands only touch (0, Ls/2), so the hermitian mirror
        is implicit). custom_vjp mirrors fwd with adjoint-scaled windows."""
        return _bwd_oct(self, tuple(coeffs))

    def bwd_complete(self, dc, coeffs, nyq) -> jnp.ndarray:
        lead = coeffs[0].shape[:-2]
        S = jnp.zeros(lead + (self.Ls, 2), self.dtype)
        for j in range(self.num_octs):
            S = self._accumulate(S, coeffs[j], self._oct_idx[j], self._oct_ws[j])
        S = self._accumulate(S, dc, self._dc[0], self._dc[2])
        S = self._accumulate(S, nyq, self._nyq[0], self._nyq[2])
        return self._finish(S)

    # ------------------------------------------------------------------ hpf
    def apply_hpf_DC(self, x: jnp.ndarray) -> jnp.ndarray:
        """Remove DC-band and Nyquist-band content (one rfft -> mask -> irfft).

        Semantics of the reference's ``CQTransform.apply_hpf_DC`` (used at
        diff_params/edm.py:184, testing/edm_sampler_inpainting.py:62-63): project
        onto the octave-band subspace so un-modeled DC/Nyquist content does not
        leak into losses or guidance norms. Exact equivalent of
        bwd(fwd(x)) in the painless case, at a fraction of the cost.

        Carries a custom VJP: crop . irfft . diag(real mask) . rfft . zero-pad
        is SELF-ADJOINT (real symmetric convolution; crop/zero-pad are mutual
        adjoints), so the cotangent rule is the operator itself — which also
        keeps jax's irfft autodiff (full-spectrum reverse/conjugate ops on a
        T(1,128)-laid-out vector) out of the guidance backprop.
        """
        return _hpf_apply(self, x)

    # ---------------------------------------------------------------- info
    # Identity hash/eq: CQT instances are static members of flax Modules; the
    # design is immutable and cached per config by get_cqt.
    def __hash__(self) -> int:
        return id(self)

    def __eq__(self, other: object) -> bool:
        return self is other

    @property
    def octave_lengths(self) -> List[int]:
        return list(self.M)

    def __repr__(self) -> str:
        return (f"CQT(num_octs={self.num_octs}, bins_per_oct={self.bins_per_oct}, "
                f"fs={self.fs}, audio_len={self.audio_len}, Ls={self.Ls}, M={self.M})")


# --------------------------------------------------------------------------
# custom-VJP kernels. Adjoint derivations (validated numerically in
# tests/test_cqt.py::test_custom_vjp_matches_autodiff):
#
#   analysis   c_j = ifft_M( wa_j * X[idx_j] ),  X = rfft(x)
#   vjp        dx  = irfft( assemble_j( (Ls / 2 M_j) wa_j * fft(dc_j) ) )
#              (rfft real->complex pair-adjoint contributes Ls/2 at interior
#               bins; ifft_M adjoint contributes fft/M; both fold into the
#               precomputed w_a table)
#
#   synthesis  y   = irfft( assemble_j( ws_j * fft(c_j) ) )
#   vjp        dc_j = ifft_M( (2 M_j / Ls) ws_j * G[idx_j] ),  G = rfft(dy)
#              (irfft pair-adjoint is (2/Ls) rfft at interior bins; fft_M
#               adjoint is M ifft)
#
# `cqt` is a nondiff static argument (identity-hashed).


def _fwd_oct_impl(cqt: "CQT", xp: jnp.ndarray):
    X = jnp.fft.rfft(xp)
    out = []
    for j in range(cqt.num_octs):
        V0 = cqt._slice_bands(X, j, cqt._seg[j]["win_a"])
        out.append(jnp.fft.ifft(V0, axis=-1) * cqt._seg[j]["phase"])
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fwd_oct(cqt: "CQT", xp: jnp.ndarray):
    return _fwd_oct_impl(cqt, xp)


def _fwd_oct_fwdrule(cqt, xp):
    return _fwd_oct_impl(cqt, xp), None


def _fwd_oct_bwdrule(cqt, _, dcs):
    # empirically pinned against autodiff (tests): conj on the incoming
    # cotangent, none on the assembled half spectrum
    U = [jnp.fft.fft(jnp.conj(dc * cqt._seg[j]["phase"]), axis=-1)
         * cqt._seg[j]["win_a_adj"]
         for j, dc in enumerate(dcs)]
    half = cqt._assemble_half(U, adjoint=True)
    dx = jnp.fft.irfft(half, n=cqt.Ls).astype(cqt.dtype)
    return (dx,)


_fwd_oct.defvjp(_fwd_oct_fwdrule, _fwd_oct_bwdrule)


def _bwd_oct_impl(cqt: "CQT", coeffs):
    U = [jnp.fft.fft(c.astype(cqt._ctype) * cqt._seg[j]["phase_c"], axis=-1)
         * cqt._seg[j]["win_s"]
         for j, c in enumerate(coeffs)]
    half = cqt._assemble_half(U, adjoint=False)
    return jnp.fft.irfft(half, n=cqt.Ls).astype(cqt.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bwd_oct(cqt: "CQT", coeffs):
    return _bwd_oct_impl(cqt, coeffs)


def _bwd_oct_fwdrule(cqt, coeffs):
    return _bwd_oct_impl(cqt, coeffs), None


def _bwd_oct_bwdrule(cqt, _, dy):
    # empirically pinned against autodiff (tests): conj on the outgoing
    # coefficient cotangents only
    G = jnp.fft.rfft(dy.astype(cqt.dtype))
    dcs = []
    for j in range(cqt.num_octs):
        V0 = cqt._slice_bands(G, j, cqt._seg[j]["win_s_adj"])
        dcs.append(jnp.conj(jnp.fft.ifft(V0, axis=-1) * cqt._seg[j]["phase"]))
    return (tuple(dcs),)


_bwd_oct.defvjp(_bwd_oct_fwdrule, _bwd_oct_bwdrule)


_CACHE: dict = {}


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _hpf_apply(cqt, x):
    T = x.shape[-1]
    X = jnp.fft.rfft(cqt._pad(x).astype(cqt.dtype))
    y = jnp.fft.irfft(X * cqt._hpf_mask, n=cqt.Ls)
    return y[..., :T].astype(cqt.dtype)


def _hpf_fwd(cqt, x):
    return _hpf_apply(cqt, x), None


def _hpf_bwd(cqt, _, g):
    return (_hpf_apply(cqt, g),)  # self-adjoint operator


_hpf_apply.defvjp(_hpf_fwd, _hpf_bwd)


def get_cqt(num_octs: int, bins_per_oct: int, fs: float, audio_len: int,
            window="hann", dtype=jnp.float32) -> CQT:
    """Cached CQT construction (window design is pure host-side numpy)."""
    if isinstance(window, list):
        window = tuple(window)
    key = (num_octs, bins_per_oct, float(fs), int(audio_len), window, str(dtype))
    if key not in _CACHE:
        _CACHE[key] = CQT(num_octs, bins_per_oct, fs, audio_len, window, dtype)
    return _CACHE[key]
