"""Sampler integration tests with an ANALYTIC denoiser (no network).

For Gaussian data x ~ N(0, sigma_d^2 I) the exact EDM denoiser is the linear
shrinkage D(x, sigma) = x * sigma_d^2 / (sigma^2 + sigma_d^2); with it the Heun
sampler must produce samples whose statistics match the data distribution.
This validates the scan loop, churn, guidance and data-consistency machinery
independently of any trained weights (cf. SURVEY.md section 4 gate (4)).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.diffusion import edm
from aid_tpu.sampling import degradations as degr
from aid_tpu.sampling.heun import SamplerConfig, heun_sample, make_score_fn

SIGMA_DATA = 1.0
P = edm.EDMParams(sigma_data=SIGMA_DATA, sigma_min=1e-4, sigma_max=10.0,
                  rho=13.0, Schurn=5.0)
L = 4096


def analytic_denoise(x, t):
    return x * SIGMA_DATA ** 2 / (t ** 2 + SIGMA_DATA ** 2)


def test_schedule_properties():
    t = edm.create_schedule(P, 35)
    assert t.shape == (36,)
    assert float(t[0]) == pytest.approx(P.sigma_max, rel=1e-5)
    assert float(t[-1]) == 0.0
    assert bool(jnp.all(jnp.diff(t) < 0))


def test_precond_identities():
    sigma = jnp.asarray([0.01, 0.1, 1.0])
    # EDM invariants: cskip^2 + (cout/sigma_data * sigma ... ) etc.
    # cin^2 * (sigma^2 + sigma_data^2) == 1
    assert jnp.allclose(edm.cin(P, sigma) ** 2 * (sigma ** 2 + SIGMA_DATA ** 2), 1.0)
    # cskip + sigma^2/(sigma^2+sd^2) == 1
    assert jnp.allclose(edm.cskip(P, sigma) + sigma ** 2 / (sigma ** 2 + SIGMA_DATA ** 2), 1.0)
    # cout^2 == sigma^2 * sd^2 / (sigma^2 + sd^2)
    assert jnp.allclose(edm.cout(P, sigma) ** 2,
                        sigma ** 2 * SIGMA_DATA ** 2 / (sigma ** 2 + SIGMA_DATA ** 2))
    assert jnp.allclose(edm.cnoise(P, sigma), 0.25 * jnp.log(sigma))


def test_train_target_identity():
    # denoising the preconditioned input with a perfect net must return x:
    # cskip*(x+n) + cout*target == x by construction (reference edm.py:150-163).
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    sigma = jnp.asarray([[0.3], [2.0]])
    net_in, target, cn = edm.prepare_train_preconditioning(P, key, x, sigma)
    xn = net_in / edm.cin(P, sigma)
    recon = edm.cskip(P, sigma) * xn + edm.cout(P, sigma) * target
    assert jnp.allclose(recon, x, atol=1e-5)


def test_ptrain_safe_within_bounds():
    s = edm.sample_ptrain_safe(P, jax.random.PRNGKey(2), 1000)
    assert float(jnp.min(s)) >= P.sigma_min * 0.999
    assert float(jnp.max(s)) <= P.sigma_max * 1.001


def test_unconditional_matches_gaussian_stats():
    cfg = SamplerConfig(T=35, order=2, xi=0.0, data_consistency=False)
    score = make_score_fn(P, cfg, analytic_denoise)
    x, _ = jax.jit(lambda k: heun_sample(k, (4, L), P, cfg, score))(jax.random.PRNGKey(3))
    std = float(jnp.std(x))
    assert 0.85 < std < 1.15, f"sample std {std} vs sigma_data {SIGMA_DATA}"
    assert abs(float(jnp.mean(x))) < 0.1


def test_unconditional_order1_also_works():
    cfg = SamplerConfig(T=70, order=1, xi=0.0, data_consistency=False)
    score = make_score_fn(P, cfg, analytic_denoise)
    x, _ = jax.jit(lambda k: heun_sample(k, (4, L), P, cfg, score))(jax.random.PRNGKey(4))
    std = float(jnp.std(x))
    assert 0.8 < std < 1.2, std


def _run_inpainting(key, y_masked, mask, smooth, cfg):
    proj = degr.inpainting_projector(y_masked, smooth)
    score = make_score_fn(P, cfg, analytic_denoise, y=y_masked,
                          degradation=degr.time_mask(mask), proj=proj)
    return heun_sample(key, y_masked.shape, P, cfg, score, proj_end=proj)


def test_inpainting_keeps_observed_region():
    mask_np = np.ones((1, L), np.float32)
    mask_np[:, 1500:2500] = 0.0
    mask = jnp.asarray(mask_np)
    y = jax.random.normal(jax.random.PRNGKey(5), (1, L)) * SIGMA_DATA
    y_masked = y * mask
    cfg = SamplerConfig(T=35, order=2, xi=0.25, data_consistency=True)
    smooth = jnp.asarray(degr.make_smooth_mask(mask_np, 50))
    x, _ = jax.jit(lambda k: _run_inpainting(k, y_masked, mask, smooth, cfg))(
        jax.random.PRNGKey(6))
    # where smooth mask == 1 the output must equal the observation
    hard = np.asarray(smooth[0]) == 1.0
    err = float(jnp.max(jnp.abs((x - y)[0, hard])))
    assert err < 1e-4, err
    # gap filled with finite content of plausible scale
    gap = np.asarray(mask[0]) == 0.0
    gap_std = float(jnp.std(x[0, gap]))
    assert np.isfinite(gap_std) and 0.3 < gap_std < 2.0


def test_inpainting_reproducible_and_key_dependent():
    mask_np = np.ones((1, L), np.float32)
    mask_np[:, 1000:1400] = 0.0
    mask = jnp.asarray(mask_np)
    y_masked = jax.random.normal(jax.random.PRNGKey(7), (1, L)) * mask
    cfg = SamplerConfig(T=10, order=2, xi=0.25, data_consistency=True)
    f = jax.jit(lambda k: _run_inpainting(k, y_masked, mask, mask, cfg)[0])
    a, b = f(jax.random.PRNGKey(8)), f(jax.random.PRNGKey(8))
    c = f(jax.random.PRNGKey(9))
    assert jnp.array_equal(a, b)
    gap = np.asarray(mask[0]) == 0
    assert float(jnp.max(jnp.abs((a - c)[0, gap]))) > 1e-4


def test_replacement_only_branch():
    # xi = 0 with observations -> replacement method (reference :147-153)
    mask_np = np.ones((1, L), np.float32)
    mask_np[:, 2000:2200] = 0.0
    mask = jnp.asarray(mask_np)
    y_masked = jax.random.normal(jax.random.PRNGKey(10), (1, L)) * mask
    cfg = SamplerConfig(T=10, order=2, xi=0.0, data_consistency=True)
    x, _ = jax.jit(lambda k: _run_inpainting(k, y_masked, mask, mask, cfg))(
        jax.random.PRNGKey(11))
    obs = np.asarray(mask[0]) == 1
    assert float(jnp.max(jnp.abs((x - y_masked)[0, obs]))) < 1e-4


def test_record_trajectories():
    cfg = SamplerConfig(T=8, order=2, xi=0.0, data_consistency=False, record=True)
    score = make_score_fn(P, cfg, analytic_denoise)
    x, rec = jax.jit(lambda k: heun_sample(k, (1, 256), P, cfg, score))(
        jax.random.PRNGKey(12))
    assert rec.xt.shape == (8, 1, 256)
    assert rec.denoised.shape == (8, 1, 256)
    assert bool(jnp.all(jnp.isfinite(rec.denoised)))


def test_smooth_mask_shape_and_ramps():
    m = np.ones((2, 1000), np.float32)
    m[:, 400:600] = 0.0
    sm = degr.make_smooth_mask(m, 50)
    assert sm.shape == m.shape
    assert np.all(sm[:, 400:600] == 0.0)          # gap untouched
    assert np.all(sm[:, :350] == 1.0)             # far field untouched
    ramp = sm[0, 350:400]
    assert ramp[0] > 0.9 and ramp[-1] < 0.1       # fade-out before gap
    assert np.all((sm >= 0) & (sm <= 1))
    ramp_in = sm[0, 600:650]
    assert ramp_in[0] < 0.1 and ramp_in[-1] > 0.9  # fade-in after gap


def test_gamma_churn_window():
    t = edm.create_schedule(P, 35)
    g = edm.get_gamma(dataclasses.replace(P, Stmin=0.05, Stmax=2.0), t[:-1])
    tt = np.asarray(t[:-1])
    inside = (tt > 0.05) & (tt < 2.0)
    assert np.all(np.asarray(g)[inside] > 0)
    assert np.all(np.asarray(g)[~inside] == 0)
