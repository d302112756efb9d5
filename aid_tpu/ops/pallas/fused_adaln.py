"""Pallas TPU kernel: fused bias-free-norm scale + adaLN modulation + GELU.

The per-layer prologue of every AdaLNResBlock is
    u = x / (std + eps) * gamma                (BiasFreeGroupNorm, no centering)
    v = u * (1 + affine(emb))                  (adaLN scale)
    y = gelu(v)                                (exact erf gelu)
Profiled on the flagship sampler (xprof framework_op_stats) this chain is a
stack of separate HBM passes (mul / erfc fusions at ~1.5-2.4 ms each across
~16 blocks per denoiser call) once the convs themselves are cheap. This kernel
performs the whole chain in ONE read + ONE write of the activation tensor; the
group-std reduction stays outside (one XLA reduce — it needs the global view
anyway), and the per-(batch, channel) scale tables are tiny [B, 1, C] blocks
broadcast inside VMEM, never materialized at activation size.

Custom VJP: analytic backward from (x, tables) in plain XLA — matching what
autodiff of the unfused composition produces for the same inputs.

Used by UnetCQT when ``network.use_pallas_fused`` is on; numerically equal to
the unfused path (tests/test_pallas.py).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _erf_poly(z):
    """erf via Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7 — f32-exact).
    lax.erf has no Pallas-TPU lowering; this uses only VPU primitives."""
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _kernel(x_ref, inv_ref, mod_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    v = x * (inv_ref[:] * mod_ref[:])          # [1,1,C] broadcasts in VMEM
    o_ref[:] = (0.5 * v * (1.0 + _erf_poly(v / _SQRT2))).astype(o_ref.dtype)


def _fused_fwd_impl(x: jnp.ndarray, inv: jnp.ndarray, mod: jnp.ndarray,
                    block_rows: int = 512) -> jnp.ndarray:
    """x [B, R, C]; inv/mod [B, 1, C] f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, R, C = x.shape
    rows = min(block_rows, R)
    grid = (B, pl.cdiv(R, rows))
    xspec = pl.BlockSpec((1, rows, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[xspec, tspec, tspec],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, R, C), x.dtype),
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
    )(x, inv, mod)


@jax.custom_vjp
def _fused(x, inv, mod):
    return _fused_fwd_impl(x, inv, mod)


def _fused_fwdrule(x, inv, mod):
    return _fused_fwd_impl(x, inv, mod), (x, inv, mod)


def _fused_bwdrule(res, g):
    x, inv, mod = res
    xf = x.astype(jnp.float32)
    s = inv * mod                               # [B, 1, C]
    v = xf * s
    phi = jnp.exp(-0.5 * v * v) * _INV_SQRT2PI
    Phi = 0.5 * (1.0 + jax.lax.erf(v / _SQRT2))
    dv = g.astype(jnp.float32) * (Phi + v * phi)
    dx = (dv * s).astype(x.dtype)
    dinv = jnp.sum(dv * xf * mod, axis=1, keepdims=True).astype(inv.dtype)
    dmod = jnp.sum(dv * xf * inv, axis=1, keepdims=True).astype(mod.dtype)
    return dx, dinv, dmod


_fused.defvjp(_fused_fwdrule, _fused_bwdrule)


def norm_adaln_gelu(x: jnp.ndarray, std: jnp.ndarray, gamma: jnp.ndarray,
                    aff: jnp.ndarray, eps: float, num_groups: int) -> jnp.ndarray:
    """gelu( x / (std+eps) * gamma * (1 + aff) ), one fused activation pass.

    x:     [B, F, T, C]
    std:   [B, G]   per-(batch, group) Bessel-corrected std (from group_std)
    gamma: [C]      norm gain
    aff:   [B, C]   adaLN affine(emb)
    """
    B, F, T, C = x.shape
    G = num_groups
    inv = (gamma.astype(jnp.float32).reshape(1, G, C // G)
           / (std[:, :, None].astype(jnp.float32) + eps)).reshape(B, 1, C)
    mod = (1.0 + aff.astype(jnp.float32)).reshape(B, 1, C)
    out = _fused(x.reshape(B, F * T, C), inv, mod)
    return out.reshape(B, F, T, C)


def group_std(x: jnp.ndarray, num_groups: int) -> jnp.ndarray:
    """Bessel-corrected std over (F, T, C/G) per channel-group (the
    BiasFreeGroupNorm reduction, torch .std ddof=1 semantics; f32)."""
    B, F, T, C = x.shape
    G = num_groups
    xf = x.astype(jnp.float32).reshape(B, F, T, G, C // G)
    n = F * T * (C // G)
    mean = jnp.mean(xf, axis=(1, 2, 4))
    sq = jnp.mean(xf * xf, axis=(1, 2, 4))
    var = jnp.maximum(sq - mean * mean, 0.0) * (n / (n - 1.0))
    return jnp.sqrt(var)  # [B, G]
