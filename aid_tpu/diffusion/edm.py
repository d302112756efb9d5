"""EDM diffusion parameterization (Karras et al. 2022) as pure JAX functions.

Capability parity with the reference's ``diff_params/edm.py`` (EDM class,
:12-193): schedule, stochasticity gamma, preconditioning c_skip/c_out/c_in/
c_noise, denoiser wrapper, prior sampling, the rho_train-shaped training-sigma
distribution, and the training loss with optional CQT DC-correction and
A-weighting hooks. Re-designed functional-first: parameters live in a frozen
dataclass; every method is jit/vmap/grad-safe (PRNG keys threaded explicitly,
no global RNG, no mutable state) so the whole loss and the whole sampler fold
into single compiled programs.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EDMParams:
    """Static diffusion hyper-parameters (reference conf/diff_params/edm.yaml)."""
    sigma_data: float = 0.063
    sigma_min: float = 1e-5
    sigma_max: float = 10.0
    rho: float = 13.0
    rho_train: float = 10.0
    P_mean: float = -1.2
    P_std: float = 1.2
    Schurn: float = 5.0
    Snoise: float = 1.0
    Stmin: float = 0.0
    Stmax: float = 50.0

    @classmethod
    def from_args(cls, dp) -> "EDMParams":
        """Build from a diff_params config node (reference edm.py:12-31 reads
        the same keys; `ro` spelling kept in configs for parity)."""
        return cls(
            sigma_data=float(dp.sigma_data), sigma_min=float(dp.sigma_min),
            sigma_max=float(dp.sigma_max), rho=float(dp.ro),
            rho_train=float(dp.get("ro_train", dp.ro)),
            P_mean=float(dp.get("P_mean", -1.2)), P_std=float(dp.get("P_std", 1.2)),
            Schurn=float(dp.Schurn), Snoise=float(dp.Snoise),
            Stmin=float(dp.Stmin), Stmax=float(dp.Stmax))


# ------------------------------------------------------------------ schedule

def create_schedule(p: EDMParams, nb_steps: int) -> jnp.ndarray:
    """Karras rho-schedule with t[-1] = 0 (reference edm.py:55-64): length
    nb_steps+1, decreasing sigma_max -> sigma_min, final entry exactly zero."""
    i = jnp.arange(nb_steps + 1, dtype=jnp.float32)
    t = (p.sigma_max ** (1 / p.rho)
         + i / (nb_steps - 1) * (p.sigma_min ** (1 / p.rho) - p.sigma_max ** (1 / p.rho))
         ) ** p.rho
    return t.at[-1].set(0.0)


def get_gamma(p: EDMParams, t: jnp.ndarray) -> jnp.ndarray:
    """Per-step churn parameter (reference edm.py:38-53): min(Schurn/N, sqrt(2)-1)
    wherever Stmin < t < Stmax, else 0."""
    N = t.shape[0]
    inside = jnp.logical_and(t > p.Stmin, t < p.Stmax)
    val = jnp.minimum(p.Schurn / N, jnp.sqrt(2.0) - 1.0)
    return jnp.where(inside, val, 0.0).astype(jnp.float32)


def sample_ptrain_safe(p: EDMParams, key: jax.Array, n: int) -> jnp.ndarray:
    """Training sigmas drawn from the rho_train-shaped schedule distribution
    (NOT log-normal) — reference edm.py:77-85."""
    a = jax.random.uniform(key, (n,))
    return (p.sigma_max ** (1 / p.rho_train)
            + a * (p.sigma_min ** (1 / p.rho_train) - p.sigma_max ** (1 / p.rho_train))
            ) ** p.rho_train


def sample_ptrain_lognormal(p: EDMParams, key: jax.Array, n: int) -> jnp.ndarray:
    """Karras log-normal alternative (reference edm.py:66-75, unused by default)."""
    ln = jax.random.normal(key, (n,)) * p.P_std + p.P_mean
    return jnp.clip(jnp.exp(ln), p.sigma_min, p.sigma_max)


def sample_prior(p: EDMParams, key: jax.Array, shape, sigma) -> jnp.ndarray:
    """sigma-scaled Gaussian noise (reference edm.py:87-95)."""
    return jax.random.normal(key, shape, jnp.float32) * sigma


# ------------------------------------------------------------- preconditioning

def cskip(p: EDMParams, sigma):
    return p.sigma_data ** 2 / (sigma ** 2 + p.sigma_data ** 2)


def cout(p: EDMParams, sigma):
    return sigma * p.sigma_data * (p.sigma_data ** 2 + sigma ** 2) ** -0.5


def cin(p: EDMParams, sigma):
    return (p.sigma_data ** 2 + sigma ** 2) ** -0.5


def cnoise(p: EDMParams, sigma):
    """(1/4) log sigma fed to the noise embedding (reference edm.py:122-128)."""
    return 0.25 * jnp.log(sigma)


def lambda_w(p: EDMParams, sigma):
    return (sigma * p.sigma_data) ** -2 * (p.sigma_data ** 2 + sigma ** 2)


def denoiser(p: EDMParams, net_apply: Callable, xn: jnp.ndarray,
             sigma: jnp.ndarray) -> jnp.ndarray:
    """D(x, sigma) = cskip*x + cout*net(cin*x, cnoise) (reference edm.py:133-148).

    net_apply: (x [B,T], cnoise [B,1]) -> [B,T].
    sigma: [B] or [B,1].
    """
    if sigma.ndim == 1:
        sigma = sigma[:, None]
    return (cskip(p, sigma) * xn
            + cout(p, sigma) * net_apply(cin(p, sigma) * xn, cnoise(p, sigma)))


# ------------------------------------------------------------------- training

def prepare_train_preconditioning(p: EDMParams, key: jax.Array, x: jnp.ndarray,
                                  sigma: jnp.ndarray):
    """Noisy input and regression target (reference edm.py:150-163):
    input = cin*(x+n), target = (x - cskip*(x+n)) / cout."""
    noise = sample_prior(p, key, x.shape, sigma)
    xn = x + noise
    return cin(p, sigma) * xn, (x - cskip(p, sigma) * xn) / cout(p, sigma), cnoise(p, sigma)


def loss_fn(p: EDMParams, net_apply: Callable, key: jax.Array, x: jnp.ndarray,
            error_filter: Optional[Callable] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample squared error + the sigmas used (reference edm.py:166-193).

    error_filter: optional linear map applied to the raw error before squaring —
    the CQT DC-correction (reference edm.py:181-186) and/or A-weighting FIR
    (reference edm.py:189-190) compose here.
    """
    k_sigma, k_noise = jax.random.split(key)
    sigma = sample_ptrain_safe(p, k_sigma, x.shape[0])[:, None]
    net_in, target, cn = prepare_train_preconditioning(p, k_noise, x, sigma)
    estimate = net_apply(net_in, cn)
    error = estimate - target
    if error_filter is not None:
        error = error_filter(error)
    return error ** 2, sigma


class EDM:
    """Object-style facade over the pure functions, constructed from the full
    config tree like the reference class (diff_params/edm.py:12-34, resolved by
    the config registry via ``callable: diff_params.edm.EDM``)."""

    def __init__(self, args):
        self.args = args
        self.params = EDMParams.from_args(args.diff_params)

    def create_schedule(self, nb_steps):
        return create_schedule(self.params, nb_steps)

    def get_gamma(self, t):
        return get_gamma(self.params, t)

    def sample_ptrain_safe(self, key, n):
        return sample_ptrain_safe(self.params, key, n)

    def sample_prior(self, key, shape, sigma):
        return sample_prior(self.params, key, shape, sigma)

    def denoiser(self, xn, net_apply, sigma):
        return denoiser(self.params, net_apply, xn, sigma)

    def loss_fn(self, net_apply, key, x, error_filter=None):
        return loss_fn(self.params, net_apply, key, x, error_filter)
