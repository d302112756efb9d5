"""Task-facade tests: every predict_* compiles and produces finite audio of
the right shape (BWE, declipping, compressive sensing, phase retrieval,
autoregressive outpainting) — reference task family edm_sampler.py:266-508."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.models.bundle import NetBundle
from aid_tpu.sampling.sampler import Sampler
from aid_tpu.utils.config import compose

L = 2048


class _FakeModule:
    """Linear stand-in denoiser network: apply(params, x, cnoise) -> 0.5x."""

    def apply(self, params, x, cn):
        return 0.5 * x


@pytest.fixture(scope="module")
def sampler():
    args = compose(overrides=[
        "exp.audio_len=2048",
        "tester.T=4",
        "tester.unconditional.audio_len=2048",
        "tester.posterior_sampling.xi=0.25",
    ])
    bundle = NetBundle(module=_FakeModule(), params={})
    from aid_tpu import setup as asetup
    ediff = asetup.setup_diff_parameters(args)
    return Sampler(bundle, ediff, args)


def _finite(x, shape):
    x = np.asarray(x)
    assert x.shape == shape
    assert np.all(np.isfinite(x))


def test_unconditional(sampler):
    x = sampler.predict_unconditional((2, L), jax.random.PRNGKey(0))
    _finite(x, (2, L))


def test_bwe_firwin(sampler):
    y = jnp.asarray(np.random.default_rng(0).standard_normal((1, L)) * 0.05,
                    jnp.float32)
    x = sampler.predict_bwe(y, jax.random.PRNGKey(1), fc=300.0, fs=22050.0,
                            filter_type="firwin", order=100)
    _finite(x, (1, L))


def test_bwe_decimate(sampler):
    y = jnp.asarray(np.random.default_rng(1).standard_normal((1, L)) * 0.05,
                    jnp.float32)
    x = sampler.predict_bwe(y, jax.random.PRNGKey(2), fc=2756.25, fs=22050.0,
                            filter_type="decimate")
    _finite(x, (1, L))


def test_declipping(sampler):
    y = jnp.clip(jnp.asarray(
        np.random.default_rng(2).standard_normal((1, L)) * 0.2, jnp.float32),
        -0.05, 0.05)
    x = sampler.predict_declipping(y, jax.random.PRNGKey(3), 0.05)
    _finite(x, (1, L))


def test_compsens(sampler):
    from aid_tpu.sampling import degradations as degr
    mask = degr.compsens_mask(jax.random.PRNGKey(4), (1, L), 10.0)
    y = jnp.asarray(np.random.default_rng(3).standard_normal((1, L)) * 0.05,
                    jnp.float32) * mask
    x = sampler.predict_compsens(y, mask, jax.random.PRNGKey(5))
    _finite(x, (1, L))


def test_phase_retrieval(sampler):
    from aid_tpu.sampling import degradations as degr
    mag = degr.stft_magnitude(sampler.args.tester.spectrogram_inpainting.stft)
    y_mag = mag(jnp.asarray(
        np.random.default_rng(4).standard_normal((1, L)) * 0.05, jnp.float32))
    x = sampler.predict_phase_retrieval(y_mag, (1, L), jax.random.PRNGKey(6))
    _finite(x, (1, L))


def test_autoregressive(sampler):
    x = sampler.predict_autoregressive(jax.random.PRNGKey(7), num_segments=3,
                                       overlap=0.25, shape=(1, L))
    n_ov = int(L * 0.25)
    assert x.shape == (1, L + 2 * (L - n_ov))
    assert np.all(np.isfinite(x))
