"""CQT-NSGT unit tests: the parity gates from SURVEY.md section 4/7 stage 1.

Gate 1: round-trip  ||x - bwd_complete(fwd_complete(x))|| ~ 1e-6 (perfect
reconstruction of the painless NSGT frame).
Gate 2: octave-band structure matches what the U-Net assumes
(reference networks:743-830): list of num_octs complex arrays, shapes
[..., bins_per_oct, M_j] with M_j exactly doubling per octave.
Gate 3: apply_hpf_DC == bwd(fwd(x)) (band-subset projection is the
precomputed frequency mask) and is idempotent.
Gate 4: a pure tone lands in the correct octave/bin.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.ops.cqt import CQT, get_cqt

CFG = dict(num_octs=5, bins_per_oct=16, fs=8000.0, audio_len=8192)


@pytest.fixture(scope="module")
def cqt():
    return CQT(**CFG, window=("kaiser", 1.0))


def _sig(n=CFG["audio_len"], seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(n).astype(np.float32))


def test_shapes_and_octave_doubling(cqt):
    x = _sig()[None, None, :]  # [B=1, C=1, T]
    out = cqt.fwd(x)
    assert len(out) == CFG["num_octs"]
    for j, c in enumerate(out):
        assert c.shape == (1, 1, CFG["bins_per_oct"], cqt.M[j])
        assert c.dtype == jnp.complex64
        if j > 0:
            assert cqt.M[j] == 2 * cqt.M[j - 1]


def test_perfect_reconstruction_complete(cqt):
    x = _sig()
    dc, octs, nyq = cqt.fwd_complete(x)
    y = cqt.bwd_complete(dc, octs, nyq)[: x.shape[-1]]
    err = float(jnp.max(jnp.abs(y - x)))
    assert err < 2e-5, f"round-trip max abs err {err}"


def test_perfect_reconstruction_batched(cqt):
    x = jnp.stack([_sig(seed=1), _sig(seed=2)])[:, None, :]
    dc, octs, nyq = cqt.fwd_complete(x)
    y = cqt.bwd_complete(dc, octs, nyq)[..., : x.shape[-1]]
    assert float(jnp.max(jnp.abs(y - x))) < 2e-5


def test_bwd_fwd_equals_hpf(cqt):
    x = _sig(seed=3)
    via_bands = cqt.bwd(cqt.fwd(x))[: x.shape[-1]]
    via_mask = cqt.apply_hpf_DC(x)
    assert float(jnp.max(jnp.abs(via_bands - via_mask))) < 2e-5


def test_hpf_rejects_dc_passes_midband(cqt):
    # Constant (pure DC) content must be removed...
    const = jnp.ones(CFG["audio_len"], jnp.float32)
    y = cqt.apply_hpf_DC(const)
    assert float(jnp.max(jnp.abs(y))) < 1e-3
    # ...while a mid-band tone passes through nearly unchanged.
    f = CFG["fs"] / 8  # center of the octave range
    t = np.arange(CFG["audio_len"]) / CFG["fs"]
    tone = jnp.asarray(np.sin(2 * np.pi * f * t).astype(np.float32))
    y = cqt.apply_hpf_DC(tone)
    mid = slice(1000, CFG["audio_len"] - 1000)
    rel = float(jnp.linalg.norm(y[mid] - tone[mid]) / jnp.linalg.norm(tone[mid]))
    assert rel < 1e-2, rel


def test_tone_localizes_to_correct_bin(cqt):
    # Tone at the center frequency of octave j=3, bin b=5.
    O, B = CFG["num_octs"], CFG["bins_per_oct"]
    fmin = CFG["fs"] / 2 / 2 ** O
    k = 3 * B + 5
    f = fmin * 2 ** (k / B)
    t = np.arange(CFG["audio_len"]) / CFG["fs"]
    x = jnp.asarray(np.sin(2 * np.pi * f * t).astype(np.float32))
    out = cqt.fwd(x)
    energy = [np.asarray(jnp.mean(jnp.abs(c) ** 2, axis=-1)) for c in out]
    j_star = int(np.argmax([e.max() for e in energy]))
    b_star = int(np.argmax(energy[j_star]))
    assert j_star == 3 and abs(b_star - 5) <= 1


def test_white_normalization(cqt):
    # White noise of std s -> coefficients of std ~ s per band (design invariant).
    x = _sig(seed=5) * 0.5
    out = cqt.fwd(x)
    for c in out[1:]:  # skip lowest octave: few samples, noisy estimate
        rms = float(jnp.sqrt(jnp.mean(jnp.abs(c) ** 2)))
        assert 0.25 < rms < 1.0, rms


def test_gradients_flow(cqt):
    x = _sig(seed=6)

    def loss(x):
        return sum(jnp.sum(jnp.abs(c) ** 2) for c in cqt.fwd(x))

    g = jax.grad(loss)(x)
    assert jnp.all(jnp.isfinite(g))
    # Analysis-synthesis subset operator: grad of ||fwd(x)||^2 is 2*hpf(x)
    # only if frame were tight; just check nonzero and finite here.
    assert float(jnp.max(jnp.abs(g))) > 0


def test_maestro_config_designs():
    # The flagship config: 7 octaves x 64 bins, 22.05 kHz, 184184 samples
    # (reference conf/network/paper_1912...yaml:31-33, conf/exp/maestro22k_8s.yaml:61-62).
    c = get_cqt(7, 64, 22050.0, 184184, window=("kaiser", 1.0))
    assert c.Ls % 2 ** 12 == 0 and c.Ls >= 184184
    assert len(c.M) == 7 and c.M[-1] == c.M[0] * 2 ** 6
    # cached
    assert get_cqt(7, 64, 22050.0, 184184, window=("kaiser", 1.0)) is c


def test_jit_and_scan_compatible(cqt):
    @jax.jit
    def roundtrip(x):
        return cqt.bwd(cqt.fwd(x))[..., : x.shape[-1]]

    x = _sig(seed=7)
    y = roundtrip(x)
    assert y.shape == x.shape
    assert float(jnp.max(jnp.abs(y - cqt.apply_hpf_DC(x)))) < 2e-5


def test_custom_vjp_matches_autodiff():
    """fwd/bwd carry hand-written scatter-free VJPs (cqt.py _fwd_oct/_bwd_oct);
    they must agree with plain autodiff through reference implementations."""
    import jax
    from aid_tpu.ops.cqt import get_cqt

    cqt = get_cqt(3, 8, 4096.0, 2048)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 2048)), jnp.float32)
    tgt = [jnp.asarray(rng.standard_normal((2, 8, m))
                       + 1j * rng.standard_normal((2, 8, m)), jnp.complex64)
           for m in cqt.M]

    def fwd_ref(xx):  # same math, no custom_vjp -> autodiff ground truth
        X = jnp.fft.fft(cqt._pad(xx).astype(cqt.dtype))
        return [jnp.fft.ifft(jnp.take(X, cqt._oct_idx[j], axis=-1)
                             * cqt._oct_wa[j], axis=-1)
                for j in range(cqt.num_octs)]

    def bwd_ref(cs):
        lead = cs[0].shape[:-2]
        S = jnp.zeros(lead + (cqt.Ls, 2), cqt.dtype)
        for j in range(cqt.num_octs):
            S = cqt._accumulate(S, cs[j], cqt._oct_idx[j], cqt._oct_ws[j])
        return cqt._finish(S)

    def loss_a(xx, f):
        return sum(jnp.sum(jnp.abs(c - t) ** 2) for c, t in zip(f(xx), tgt))

    g_new = jax.grad(lambda xx: loss_a(xx, cqt.fwd))(x)
    g_ref = jax.grad(lambda xx: loss_a(xx, fwd_ref))(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)

    cs = fwd_ref(x)
    g2_new = jax.grad(lambda c: jnp.sum((cqt.bwd(c) - 0.3) ** 2))(cs)
    g2_ref = jax.grad(lambda c: jnp.sum((bwd_ref(c) - 0.3) ** 2))(cs)
    for a, b in zip(g2_new, g2_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)

    # primal equivalence of the half-spectrum path vs the full-fft path
    for a, b in zip(cqt.fwd(x), fwd_ref(x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cqt.bwd(cs)), np.asarray(bwd_ref(cs)),
                               atol=1e-5)


def test_flagship_designs_construct():
    """Both released-model CQT designs must construct with valid painless
    frames (MAESTRO 22k/7oct, MusicNet 44k/8oct — reference conf/network/*)."""
    from aid_tpu.ops.cqt import CQT
    for num_octs, fs in ((7, 22050.0), (8, 44100.0)):
        c = CQT(num_octs, 64, fs, 184184, window=("kaiser", 1.0))
        assert len(c.M) == num_octs
        for a, b in zip(c.M, c.M[1:]):
            assert b == 2 * a
        assert c.Ls >= 184184 and c.Ls % (2 ** (num_octs + 5)) == 0
