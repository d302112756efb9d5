"""Second-witness CQT gate: production transform vs an independent naive NSGT.

The production CQT (aid_tpu/ops/cqt.py) is the one untested link to the
reference's released checkpoints — the external ``cqt_nsgt_pytorch`` package
it replaces (instantiated at reference
networks/unet_cqt_oct_with_projattention_adaLN_2.py:620) is not installable
offline, so roundtrip/tone/VJP tests alone are self-consistent but cannot
catch a derivation bug in the band layout, window sampling, or
normalization. This gate compares the production fwd/bwd
coefficient-for-coefficient and sample-for-sample against
tests/cqt_witness.py: a deliberately-naive dense-DFT NSGT written straight
from the Velasco/Holighaus equations with none of the production machinery
(no half-spectrum slices, slot folds, phase ramps, or residue-class
concatenation). Agreement means any remaining checkpoint-parity risk is a
convention difference vs the pip package, not a math bug.
"""
import numpy as np
import pytest

from aid_tpu.ops.cqt import CQT

from .cqt_witness import witness_transforms

SMALL = dict(num_octs=5, bins_per_oct=16, fs=8000.0, audio_len=8192)
FLAGSHIP = dict(num_octs=7, bins_per_oct=64, fs=22050.0, audio_len=184184)
WINDOW = ("kaiser", 1.0)  # the flagship operating point's window


def _signals(audio_len, fs, seed=0):
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(audio_len).astype(np.float32)
    t = np.arange(audio_len) / fs
    tone = np.sin(2 * np.pi * (fs / 8.0) * t).astype(np.float32)
    chirp = np.sin(2 * np.pi * (fs / 64.0) * t * (1 + t / t[-1]))
    return {"noise": noise, "tone": tone,
            "chirp": chirp.astype(np.float32)}


def _compare(cfg, atol_fwd, atol_bwd):
    cqt = CQT(**cfg, window=WINDOW)
    wf, wb = witness_transforms(
        cfg["num_octs"], cfg["bins_per_oct"], cfg["fs"], cfg["audio_len"],
        cqt.Ls, cqt.M, WINDOW)

    for name, x in _signals(cfg["audio_len"], cfg["fs"]).items():
        got = [np.asarray(c) for c in cqt.fwd(x)]
        want = wf(x)
        # normalize by the GLOBAL coefficient scale: a tone leaves far-away
        # octaves ~empty, where a per-octave denominator would amplify pure
        # float32 noise into fake relative error
        scale = max(max(float(np.max(np.abs(w))) for w in want), 1e-9)
        for j, (g, w) in enumerate(zip(got, want)):
            err = float(np.max(np.abs(g - w))) / scale
            assert err < atol_fwd, (
                f"{name}: octave {j} fwd mismatch rel={err:.2e}")

    # synthesis: random structured coefficients through both paths
    rng = np.random.default_rng(7)
    octs = [
        (rng.standard_normal((cfg["bins_per_oct"], M))
         + 1j * rng.standard_normal((cfg["bins_per_oct"], M))
         ).astype(np.complex64)
        for M in cqt.M
    ]
    got = np.asarray(cqt.bwd([c for c in octs]))
    want = wb([np.asarray(c) for c in octs])
    scale = max(float(np.max(np.abs(want))), 1e-9)
    err = float(np.max(np.abs(got - want))) / scale
    assert err < atol_bwd, f"bwd mismatch rel={err:.2e}"


def test_witness_small_config():
    _compare(SMALL, atol_fwd=2e-5, atol_bwd=2e-5)


@pytest.mark.slow
def test_witness_flagship_config():
    """The exact released operating point: 7 octaves, 64 bins/oct, kaiser
    beta=1, 22.05 kHz, 184184 samples (reference conf/conf_maestro_22k_8s.yaml
    + networks:620)."""
    _compare(FLAGSHIP, atol_fwd=5e-5, atol_bwd=5e-5)


def test_witness_roundtrip_self_consistency():
    """The witness itself must reconstruct: bwd(fwd(x)) == hpf(x) up to the
    band-limitation — checked against the production apply_hpf_DC, which is a
    THIRD computation path (precomputed diagonal mask)."""
    cfg = SMALL
    cqt = CQT(**cfg, window=WINDOW)
    wf, wb = witness_transforms(
        cfg["num_octs"], cfg["bins_per_oct"], cfg["fs"], cfg["audio_len"],
        cqt.Ls, cqt.M, WINDOW)
    x = _signals(cfg["audio_len"], cfg["fs"], seed=3)["noise"]
    y = wb(wf(x))[: cfg["audio_len"]]
    ref = np.asarray(cqt.apply_hpf_DC(x))
    assert float(np.max(np.abs(y - ref))) < 2e-5
