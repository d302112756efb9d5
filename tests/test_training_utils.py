"""Training-utility tests: device resampling vs scipy, A-weighting, stats,
augmentations, EMA schedule."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from aid_tpu.training import stats as tstats
from aid_tpu.training import utils as tutils


def test_resample_2to1_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8192)).astype(np.float32)
    y = np.asarray(tutils.resample(jnp.asarray(x), 44100, 22050))
    ref = scipy.signal.resample_poly(x, 1, 2, axis=-1)
    assert y.shape[-1] == 4096
    # same band, different anti-alias filters: compare in the passband sense
    err = np.abs(y[:, 100:-100] - ref[:, 100:-100]).mean()
    assert err < 0.05, err


def test_resample_identity():
    x = jnp.ones((1, 100))
    np.testing.assert_array_equal(np.asarray(tutils.resample(x, 22050, 22050)),
                                  np.asarray(x))


def test_resample_batch_mixed_rates():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 4096)).astype(np.float32)
    fs = np.asarray([44100, 48000, 22050])
    out = np.asarray(tutils.resample_batch(jnp.asarray(x), jnp.asarray(fs), 22050))
    assert out.shape == (3, 4096)
    # row 2 was already at target rate: identity on the leading samples
    np.testing.assert_allclose(out[2], x[2], atol=1e-5)
    # rows 0/1 are half-length signals padded at the tail; a half-band lowpass
    # cuts white-noise amplitude by ~sqrt(2)
    ratio = float(np.abs(out[0][:2048]).mean()) / float(np.abs(x[0]).mean())
    assert 0.4 < ratio < 0.95, ratio


def test_aweighting_shapes_and_response():
    f = tutils.a_weighting_filter(22050, 101)
    x = jnp.zeros((2, 1024)).at[:, 512].set(1.0)
    y = np.asarray(f(x))
    assert y.shape == (2, 1024)
    # A-weighting suppresses low frequencies: DC gain must be tiny
    taps = tutils._design_aweighting(22050, 101)
    dc = abs(taps.sum())
    assert dc < 0.1, dc


def test_augment_polarity_only_flips_sign():
    x = jnp.asarray(np.random.default_rng(2).standard_normal((8, 64)), jnp.float32)
    cfg = {"rev_polarity": True}
    y = tutils.augment(jax.random.PRNGKey(0), x, cfg)
    ratio = np.asarray(y / x)
    for r in ratio:
        assert np.allclose(r, 1.0) or np.allclose(r, -1.0)


def test_augment_pitch_shift_enabled_raises():
    # enabled-but-unimplemented config must fail loudly, never no-op
    x = jnp.zeros((2, 16), jnp.float32)
    cfg = {"pitch_shift": {"use": True}}
    with pytest.raises(NotImplementedError):
        tutils.augment(jax.random.PRNGKey(0), x, cfg)
    # disabled key stays a no-op
    y = tutils.augment(jax.random.PRNGKey(0), x,
                       {"pitch_shift": {"use": False}})
    assert y.shape == x.shape


def test_ema_rate_rampup():
    assert tutils.ema_rate_at(0, 4, 0.9999, 10000) == pytest.approx(1 / 10)
    assert tutils.ema_rate_at(10 ** 7, 4, 0.9999, 10000) == pytest.approx(0.9999)
    assert tutils.ema_rate_at(5, 4, 0.9999, None) == pytest.approx(0.9999)


def test_moments_and_collector():
    x = jnp.asarray([1.0, 2.0, 3.0])
    m = np.asarray(tstats.moments(x))
    np.testing.assert_allclose(m, [3, 6, 14])
    c = tstats.Collector()
    c.update("loss", m)
    c.update("loss", m)
    assert c.mean("loss") == pytest.approx(2.0)
    assert c.std("loss") == pytest.approx(np.sqrt(14 / 3 - 4))
    c.flush()
    assert np.isnan(c.mean("loss"))


def test_sigma_binned_moments():
    edges = jnp.asarray(tstats.make_sigma_bins(1e-4, 1.0, 4))
    sigma = jnp.asarray([2e-4, 0.5, 0.9])
    loss = jnp.asarray([1.0, 2.0, 3.0])
    out = np.asarray(tstats.sigma_binned_moments(loss, sigma, edges))
    assert out.shape == (4, 3)
    assert out[0, 0] == 1 and out[0, 1] == pytest.approx(1.0)
    assert out[-1, 0] == 2 and out[-1, 1] == pytest.approx(5.0)


def test_ema_warmup_class():
    w = tutils.EMAWarmup(inv_gamma=1.0, power=1.0)
    v0 = w.get_value()
    w.step()
    assert w.get_value() > v0
    sd = w.state_dict()
    w2 = tutils.EMAWarmup()
    w2.load_state_dict(sd)
    assert w2.get_value() == w.get_value()


def test_resample_batch_rate_specialization():
    """Static single-rate path must equal the full 4-branch select path."""
    import jax.numpy as jnp
    from aid_tpu.training.utils import resample_batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4410)), jnp.float32)
    fs = jnp.full((2,), 44100)
    full = np.asarray(resample_batch(x, fs, 22050))
    fast = np.asarray(resample_batch(x, fs, 22050, rates=(44100,)))
    np.testing.assert_allclose(fast, full, atol=1e-6)
    # identity when the batch is already at the target rate
    same = np.asarray(resample_batch(x, jnp.full((2,), 22050), 22050,
                                     rates=(22050,)))
    np.testing.assert_array_equal(same, np.asarray(x))
