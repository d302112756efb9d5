"""Fused res-block epilogue + chain-layout transition (Pallas TPU).

At every chain-stack layout boundary the program today runs TWO full HBM
passes over the level tensor: the gate/residual epilogue fusion
``h = (h0 + y*scale)/sqrt(2)`` (read h0,y / write h) followed by the
residue-regroup transition copy (read h / write h'). Since the transition is
a pure ROW permutation — each (T, C) plane moves wholesale between the
flattened [B*d, F/d] row grids (see unet_cqt._regroup_transition) — the two
fuse into ONE pass: a gather-rows kernel whose per-row body is the epilogue
arithmetic. Rows are gathered with the canonical TPU scalar-prefetch
pattern (``PrefetchScalarGridSpec``: the int32 row map is prefetched and
BlockSpec index_maps read it), so the pipeline double-buffers the row DMAs
automatically — the exact shape Pallas is good at, unlike the deleted conv
megakernel (PARITY.md) whose MXU phases lost to XLA's cross-op overlap.

Exactness: the row maps are derived from the same index algebra as
``_regroup_transition`` (f = m*d + c, class c = f mod d; transition d1->d2
maps out-row (b, c2=j*d1+c1, m2) <- in-row (b, c1, m1=m2*r+j), r=d2/d1) and
the VJP inverts the permutation STRUCTURALLY (one transpose, same cost as
the unfused backward) rather than with a gather.

Reference context: the epilogue is the ResnetBlock gate/residual of
networks/unet_cqt_oct_with_projattention_adaLN_2.py:476-491; the layout
machinery is this repo's TPU formulation and has no reference counterpart.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


@functools.lru_cache(maxsize=None)
def _row_map(B: int, F: int, d1: int, d2: int) -> np.ndarray:
    """out_row -> in_row over the flattened [B*d, F/d] row grids.

    Covers entry (d1=1), chained (d2 = r*d1) and exit (d2=1) transitions,
    matching unet_cqt._regroup_transition's (B, class)-ordered batch and
    m-major freq exactly."""
    if d2 == 1:
        F1 = F // d1
        out = np.empty((B, F), np.int32)
        for b in range(B):
            for f in range(F):
                m1, c1 = divmod(f, d1)
                out[b, f] = (b * d1 + c1) * F1 + m1
        return out.reshape(-1)
    r = d2 // d1
    F1, F2 = F // d1, F // d2
    out = np.empty((B, d2, F2), np.int32)
    for b in range(B):
        for c2 in range(d2):
            j, c1 = divmod(c2, d1)
            for m2 in range(F2):
                out[b, c2, m2] = (b * d1 + c1) * F1 + (m2 * r + j)
    return out.reshape(-1)


def _kernel(m_ref, h0_ref, y_ref, sc_ref, out_ref):
    sc = sc_ref[...].astype(jnp.float32)[:, None, :]
    v = (h0_ref[...].astype(jnp.float32)
         + y_ref[...].astype(jnp.float32) * sc) * _INV_SQRT2
    out_ref[...] = v.astype(out_ref.dtype)


def _fused_rows(h0, y, sc, rows_np, F1):
    """out[r] = (h0[m[r]] + y[m[r]] * sc[m[r]//F1]) / sqrt(2).

    h0, y: [R, T, C]; sc: [Bd, C]; rows_np: int32 [R] host map."""
    R, T, C = h0.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R,),
        in_specs=[
            pl.BlockSpec((1, T, C), lambda r, mm: (mm[r], 0, 0)),
            pl.BlockSpec((1, T, C), lambda r, mm: (mm[r], 0, 0)),
            pl.BlockSpec((1, C), lambda r, mm: (mm[r] // F1, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda r, mm: (r, 0, 0)),
    )
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, T, C), h0.dtype),
        interpret=interpret,
    )(jnp.asarray(rows_np), h0, y, sc)


def _regroup_inverse(g, d1: int, d2: int, B: int, F: int):
    """Inverse of the d1->d2 row permutation, as ONE structured transpose
    (never a gather): the backward pays exactly what the unfused
    transition's autodiff transpose pays today."""
    from aid_tpu.models.unet_cqt import _regroup_transition
    if d1 == 1:
        return _regroup_transition(g, d2, 1, B)
    if d2 == 1:
        return _regroup_transition(g, 1, d1, B)
    Bd2, F2, T, C = g.shape
    r = d2 // d1
    z = g.reshape(B, r, d1, F2, T, C).transpose(0, 2, 3, 1, 4, 5)
    return z.reshape(B * d1, (F2 * r), T, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def epilogue_transition(h0, y, scale_r, d1: int, d2: int, B: int, F: int):
    """(h0 + y*scale)/sqrt(2) emitted directly in layout-d2 (one HBM pass).

    h0, y: [B*d1, F/d1, T, C] (layout d1); scale_r: [B*d1, C] (gate scale,
    class-repeated). Returns [B*d2, F/d2, T, C] (layout d2; d2=1 = plain)."""
    Bd1, F1, T, C = h0.shape
    rows = _row_map(B, F, d1, d2)
    out = _fused_rows(h0.reshape(Bd1 * F1, T, C), y.reshape(Bd1 * F1, T, C),
                      scale_r, rows, F1)
    if d2 == 1:
        return out.reshape(B, F, T, C)
    return out.reshape(B * d2, F // d2, T, C)


def _fwd(h0, y, scale_r, d1, d2, B, F):
    return epilogue_transition(h0, y, scale_r, d1, d2, B, F), (y, scale_r)


def _bwd(d1, d2, B, F, res, g):
    y, scale_r = res
    gp = _regroup_inverse(g, d1, d2, B, F) * _INV_SQRT2  # back to layout d1
    dh0 = gp.astype(y.dtype)
    dy = (gp * scale_r[:, None, None, :].astype(gp.dtype)).astype(y.dtype)
    dsc = jnp.sum(gp * y.astype(gp.dtype), axis=(1, 2)).astype(scale_r.dtype)
    return dh0, dy, dsc


epilogue_transition.defvjp(_fwd, _bwd)
