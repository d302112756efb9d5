"""Pallas TPU megakernel: one fused adaLN dilated-conv layer of the U-Net.

The per-layer body of the AdaLNResBlock dilated stack (reference ResnetBlock,
networks/unet_cqt_oct_with_projattention_adaLN_2.py:425-482) is

    g   = gelu( h * mult )                 # mult = gain/(std+eps) * (1+affine)
    y   = conv2d_same( g, W, dil=(d, 1) )  # (5,3) kernel, freq dilation d
    out = ( h + y * gate ) / sqrt(2)       # zero-init gate, residual

Under XLA this costs, per layer, ~4 extra HBM passes over the activation
(norm-scale+gelu fusion, conv layout copies in/out, gate+residual fusion) on
top of the conv itself — measured 22% "data formatting" + 24% loop-fusion time
per guided score (scripts/parse_xplane.py on the flagship trace). This kernel
computes the whole layer in ONE pass: read a haloed window of h from HBM,
gelu it in VMEM (straight into a freq-tap-concatenated [M, 5C] operand), one
deep [M, 5C] @ [5C, 3N] MXU dot, 3-slice shift-combine + gate/residual
epilogue, write out.

STATUS (measured on v5e, see PARITY.md): correct and checkpoint-compatible,
but SLOWER than the XLA path end to end — per-layer trace at the L3 shape:
820 us for XLA's conv+fusions vs 1.0-1.7 ms for kernel variants (15 narrow
dots / 5 wide dots / 1 deep dot). XLA overlaps DMA/MXU/VPU across ops; this
kernel's phases serialize per grid step. Shipped flag-gated OFF
(network.use_conv_megakernel); the next lever is in-kernel double-buffered
pipelining (emit_pipeline) of the window DMAs against the dot.

Mosaic constraints honored (PARITY.md round-2 notes):
  * no erf lowering -> polynomial erf (|err| <= 1.5e-7, f32-exact);
  * dynamic offsets only on the untiled F dim or x16-aligned on the sublane
    (T) dim -> halos are 2d rows (F, untiled) x 16 cols (T, aligned DMA);
  * tap slices are static; window loads are 3x3 conditional region DMAs;
  * value slices are static-offset only.

Dilation: taps are static row offsets i*d for d <= 4; for d >= 8 the caller
wraps the kernel in the residue-class regrouping (dilated conv == plain conv
per residue class; every non-conv op in the layer is per-channel so the whole
fused layer commutes with regrouping).

custom VJP:
  dh    = dout/sqrt(2) + mult * gelu'(h*mult) * convT(dout*gate/sqrt(2), W)
  dmult = sum_{F,T} h * gelu'(h*mult) * convT(...)        (Pallas, same shape)
  dgate, dW = XLA expressions (dead code under reconstruction guidance, where
  only d/dx is requested -> XLA DCEs them; live for training).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SQRT2 = math.sqrt(2.0)
_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)
_TH = 16  # time halo (sublane-aligned); taps only need 1


def _erf_poly(z):
    """erf via Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7). lax.erf has no
    Mosaic lowering; this is VPU-only."""
    s = jnp.sign(z)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_f32(v):
    return 0.5 * v * (1.0 + _erf_poly(v * _INV_SQRT2))


def _dgelu_f32(v):
    phi = jnp.exp(-0.5 * v * v) * _INV_SQRT2PI
    Phi = 0.5 * (1.0 + _erf_poly(v * _INV_SQRT2))
    return Phi + v * phi


def _pick_blocks(F: int, T: int, C: int, d: int,
                 budget: float = 13e6) -> Tuple[int, int]:
    """Choose (BF, BT) under the 16M scoped-VMEM limit. The cost model was
    calibrated against actual Mosaic scoped allocations (win + g haloed bf16
    buffers, f32 acc plus one f32 dot temp, double-buffered out block plus one
    bf16 temp)."""
    Cp = max(128, C)  # VMEM lane padding

    def cost(bf, bt):
        win = (bf + 4 * d) * (bt + 2 * _TH) * Cp * 2
        g5 = bf * (bt + 2 * _TH) * 5 * Cp * 2
        acc3 = bf * (bt + 2 * _TH) * 3 * Cp * 4
        hc = bf * bt * Cp * 2  # bwd-only 'h center' scratch; blocks are
        # shared between fwd and bwd so the budget covers the larger (bwd) set
        return win + g5 + 2 * acc3 + 2 * bf * bt * Cp * 2 + hc

    # BT must stay >= _TH: _load_window's halo offset (ti-1)*BT+(BT-_TH)
    # requires a non-negative constant term (Mosaic) and a halo that fits in
    # the previous block. Shapes with no valid BT take the XLA path instead.
    bts = [t for t in (512, 256, 128, 64, 32, 16) if t <= T and T % t == 0]
    if not bts:
        if T >= _TH:
            bts = [T]
        else:
            raise ValueError(
                f"conv megakernel needs T >= {_TH} (got T={T}); "
                f"use the XLA conv path for this shape")
    bfs = [f for f in (64, 48, 32, 24, 16, 12, 8, 6, 4, 2)
           if f <= F and F % f == 0] or [F]
    best = None
    for bt in bts:
        for bf in bfs:
            if cost(bf, bt) <= budget:
                score = bf * bt  # bigger blocks amortize halo + DMA
                if best is None or score > best[0]:
                    best = (score, bf, bt)
                break  # bfs sorted desc: first fitting bf is the biggest
    if best is None:
        return (bfs[-1], bts[-1])
    return best[1], best[2]


def _load_window(src, win, b, fi, ti, BF, BT, d, F, T):
    """DMA the haloed window src[b, f0-2d : f0+BF+2d, t0-TH : t0+BT+TH, :]
    (f0 = fi*BF, t0 = ti*BT) into win, zero-filling out-of-range regions.
    3x3 conditional region DMAs; F offsets are unconstrained (untiled dim),
    T offsets are TH-aligned. Mosaic gotcha: sublane-dim offset expressions
    must not contain negative constant terms (the remote compiler dies on
    ``ti*BT - TH`` but accepts the equal ``(ti-1)*BT + (BT-TH)``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f0 = fi * BF
    t0 = ti * BT

    def region(dma_sem, fsrc, fdst, flen, tsrc, tdst, tlen, valid):
        @pl.when(valid)
        def _():
            cp = pltpu.make_async_copy(
                src.at[b, pl.ds(fsrc, flen), pl.ds(tsrc, tlen), :],
                win.at[pl.ds(fdst, flen), pl.ds(tdst, tlen), :],
                dma_sem)
            cp.start()
            cp.wait()

    def run(dma_sem):
        win[...] = jnp.zeros_like(win)   # edge regions stay zero (SAME pad)
        fregs = [(f0 - 2 * d, 0, 2 * d, f0 - 2 * d >= 0),
                 (f0, 2 * d, BF, True),
                 (f0 + BF, 2 * d + BF, 2 * d, f0 + BF + 2 * d <= F)]
        tlo = (ti - 1) * BT + (BT - _TH)           # == t0 - _TH, see above
        tregs = [(tlo, 0, _TH, ti > 0),
                 (t0, _TH, BT, True),
                 (t0 + BT, _TH + BT, _TH, t0 + BT + _TH <= T)]
        for fsrc, fdst, flen, fok in fregs:
            for tsrc, tdst, tlen, tok in tregs:
                region(dma_sem, fsrc, fdst, flen, tsrc, tdst, tlen,
                       jnp.logical_and(fok, tok))

    pl.run_scoped(run, pltpu.SemaphoreType.DMA(()))


def _fwd_kernel(BF, BT, d, F, T, h_hbm, mult_ref, gate_ref, w_ref, out_ref,
                win, g, acc):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    fi = pl.program_id(1)
    ti = pl.program_id(2)
    _load_window(h_hbm, win, b, fi, ti, BF, BT, d, F, T)

    mult = mult_ref[0, 0][None, None, :]                    # [1,1,C] f32
    C = win.shape[-1]

    # gelu the window straight into the freq-tap-concatenated operand
    # g5[r, t, i*C + c] = gelu(win[r + i*d, t, c] * mult): the 5 freq taps sit
    # side by side in lanes so the whole conv is ONE deep matmul
    # [M, 5C] @ [5C, 3N] — no accumulator churn, K = 5C deep for the MXU.
    # Row-chunked (full-window f32 temps would blow scoped VMEM); overlapping
    # rows recompute gelu up to 5x — VPU work, noise next to the dot.
    ch = 2 if BF % 2 == 0 else 1

    def gelu_rows(r, _):
        for i in range(5):
            wr = win[pl.ds(r * ch + i * d, ch)].astype(jnp.float32)
            g[pl.ds(r * ch, ch), :, i * C:(i + 1) * C] = _gelu_f32(
                wr * mult).astype(g.dtype)
        return 0

    jax.lax.fori_loop(0, BF // ch, gelu_rows, 0)

    acc[:] = jax.lax.dot_general(
        g[...], w_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [BF, BT+2TH, 3N]

    # bf16 epilogue: conv result downcast before the gate/residual math, the
    # same numeric path as the unfused model (conv output cast to bf16 there)
    gate = gate_ref[0, 0][None, None, :]
    N = out_ref.shape[-1]
    cho = 2 if BF % 2 == 0 else 1

    def epi_rows(r, _):
        a = acc[pl.ds(r * cho, cho)]                        # [cho, BT+2TH, 3N]
        y = (a[:, _TH - 1:_TH - 1 + BT, 0:N]
             + a[:, _TH:_TH + BT, N:2 * N]
             + a[:, _TH + 1:_TH + 1 + BT, 2 * N:3 * N])
        y16 = (y * gate).astype(out_ref.dtype)
        hc = win[pl.ds(2 * d + r * cho, cho), _TH:_TH + BT, :]
        out_ref[0, pl.ds(r * cho, cho)] = (hc + y16) * jnp.asarray(
            _INV_SQRT2, out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, BF // cho, epi_rows, 0)


def _bwd_kernel(BF, BT, d, F, T, dout_hbm, h_hbm, mult_ref, gate_ref, wf_ref,
                dh_ref, dmult_ref, win, g, acc, hc):
    """dh and the dmult partial sums. wf_ref is the tap-flipped kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    fi = pl.program_id(1)
    ti = pl.program_id(2)
    f0 = fi * BF
    t0 = ti * BT

    _load_window(dout_hbm, win, b, fi, ti, BF, BT, d, F, T)

    gate = gate_ref[0, 0][None, None, :]
    C = dh_ref.shape[-1]
    ch = 2 if BF % 2 == 0 else 1

    def gate_rows(r, _):
        for i in range(5):
            wr = win[pl.ds(r * ch + i * d, ch)].astype(jnp.float32)
            g[pl.ds(r * ch, ch), :, i * C:(i + 1) * C] = (
                wr * (gate * _INV_SQRT2)).astype(g.dtype)
        return 0

    jax.lax.fori_loop(0, BF // ch, gate_rows, 0)

    acc[:] = jax.lax.dot_general(
        g[...], wf_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [BF, BT+2TH, 3C]

    def run(sem):
        cp = pltpu.make_async_copy(
            h_hbm.at[b, pl.ds(f0, BF), pl.ds(t0, BT), :], hc, sem)
        cp.start()
        cp.wait()

    pl.run_scoped(run, pltpu.SemaphoreType.DMA(()))

    mult = mult_ref[0, 0][None, None, :]
    cho = 2 if BF % 2 == 0 else 1

    def epi_rows(r, carry):
        a = acc[pl.ds(r * cho, cho)]                        # [cho, BT+2TH, 3C]
        dg = (a[:, _TH - 1:_TH - 1 + BT, 0:C]
              + a[:, _TH:_TH + BT, C:2 * C]
              + a[:, _TH + 1:_TH + 1 + BT, 2 * C:3 * C])
        hf = hc[pl.ds(r * cho, cho)].astype(jnp.float32)
        dpre = dg * _dgelu_f32(hf * mult)
        dout_c = win[pl.ds(2 * d + r * cho, cho), _TH:_TH + BT, :
                     ].astype(jnp.float32)
        dh_ref[0, pl.ds(r * cho, cho)] = (
            dout_c * _INV_SQRT2 + dpre * mult).astype(dh_ref.dtype)
        return carry + jnp.sum(dpre * hf, axis=(0, 1))      # [C] f32

    part = jax.lax.fori_loop(
        0, BF // cho, epi_rows,
        jnp.zeros((hc.shape[-1],), jnp.float32))

    @pl.when(jnp.logical_and(fi == 0, ti == 0))
    def _():
        dmult_ref[0, 0] = part

    @pl.when(jnp.logical_not(jnp.logical_and(fi == 0, ti == 0)))
    def _():
        dmult_ref[0, 0] = dmult_ref[0, 0] + part


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_call(h, mult, gate, w, d):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F, T, C = h.shape
    N = w.shape[-1]
    assert C == N, "fused layer requires C == N (the dilated stack)"
    BF, BT = _pick_blocks(F, T, C, d)
    grid = (B, F // BF, T // BT)
    kern = functools.partial(_fwd_kernel, BF, BT, d, F, T)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                  # h (HBM)
            pl.BlockSpec((1, 1, C), lambda b, f, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),                 # mult
            pl.BlockSpec((1, 1, C), lambda b, f, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),                 # gate
            pl.BlockSpec((5 * C, 3 * N), lambda b, f, t: (0, 0),
                         memory_space=pltpu.VMEM),                 # w5
        ],
        out_specs=pl.BlockSpec((1, BF, BT, N), lambda b, f, t: (b, f, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F, T, N), h.dtype),
        scratch_shapes=[
            pltpu.VMEM((BF + 4 * d, BT + 2 * _TH, C), h.dtype),    # win
            pltpu.VMEM((BF, BT + 2 * _TH, 5 * C), h.dtype),        # g5
            pltpu.VMEM((BF, BT + 2 * _TH, 3 * N), jnp.float32),    # acc3
        ],
        interpret=_interpret(),
    )(h, mult[:, None, :], gate[:, None, :],
      w.transpose(0, 2, 1, 3).reshape(5 * C, 3 * N))


def _bwd_call(dout, h, mult, gate, wf, d):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, F, T, C = h.shape
    BF, BT = _pick_blocks(F, T, C, d)
    grid = (B, F // BF, T // BT)
    kern = functools.partial(_bwd_kernel, BF, BT, d, F, T)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                  # dout
            pl.BlockSpec(memory_space=pltpu.ANY),                  # h
            pl.BlockSpec((1, 1, C), lambda b, f, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, f, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5 * C, 3 * C), lambda b, f, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BF, BT, C), lambda b, f, t: (b, f, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, f, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, F, T, C), dout.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((BF + 4 * d, BT + 2 * _TH, C), dout.dtype),
            pltpu.VMEM((BF, BT + 2 * _TH, 5 * C), dout.dtype),     # dy5
            pltpu.VMEM((BF, BT + 2 * _TH, 3 * C), jnp.float32),    # dg acc3
            pltpu.VMEM((BF, BT, C), dout.dtype),                   # h center
        ],
        interpret=_interpret(),
    )(dout, h, mult[:, None, :], gate[:, None, :],
      wf.transpose(0, 2, 1, 3).reshape(5 * C, 3 * C))


# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused_layer(h, mult, gate, w, d):
    return _fwd_call(h, mult, gate, w, d)


def _fused_layer_fwdrule(h, mult, gate, w, d):
    return _fwd_call(h, mult, gate, w, d), (h, mult, gate, w)


def _fused_layer_bwdrule(d, res, dout):
    h, mult, gate, w = res
    # transpose conv: flip taps AND swap in/out channel dims (C == N keeps the
    # shapes identical — getting this wrong would be silent)
    wf = w[::-1, ::-1].transpose(0, 1, 3, 2)
    dh, dmult = _bwd_call(dout, h, mult, gate, wf, d)
    dmult = dmult[:, 0, :]
    # dgate / dW in plain XLA: live only in training (XLA DCEs both subgraphs
    # in the guidance backprop, where only d/dx is requested).
    gfull = _gelu_f32(h.astype(jnp.float32)
                      * mult[:, None, None, :]).astype(h.dtype)

    def conv(gv, wv):
        return jax.lax.conv_general_dilated(
            gv, wv, (1, 1), "SAME", rhs_dilation=(d, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dy = (dout.astype(jnp.float32) * gate[:, None, None, :] * _INV_SQRT2
          ).astype(h.dtype)
    y = conv(gfull, w)
    dgate = jnp.sum(dout.astype(jnp.float32) * y.astype(jnp.float32)
                    * _INV_SQRT2, axis=(1, 2)).astype(gate.dtype)
    dw = jax.vjp(lambda wv: conv(gfull, wv), w)[1](dy)[0]
    return dh, dmult.astype(mult.dtype), dgate, dw


_fused_layer.defvjp(_fused_layer_fwdrule, _fused_layer_bwdrule)


def _fold2_weights(w: jnp.ndarray) -> jnp.ndarray:
    """Kernel for the time-pair-folded conv: the (5,3) conv on [*,F,T,C]
    equals a (5,3) conv on [*,F,T/2,2C] (lanes = [t-even C | t-odd C]) with
    this block-structured [5,3,2C,2N] kernel. 2x nominal MACs — a wash on the
    MXU, which pads K=C=64 to 128 anyway — but the folded layout has 128-wide
    lanes, which Mosaic DMA slicing requires. Differentiable (training dW
    flows back through the block placement)."""
    kh, kw, C, N = w.shape
    assert kw == 3
    w2 = jnp.zeros((kh, 3, 2 * C, 2 * N), w.dtype)
    # even-t outputs (cols :N): taps t-1 (prev pair, odd), t (this, even),
    # t+1 (this, odd); odd-t outputs (cols N:): t (this, even), t+1 (this,
    # odd), t+2 (next pair, even)
    w2 = w2.at[:, 0, C:, :N].set(w[:, 0])
    w2 = w2.at[:, 1, :C, :N].set(w[:, 1])
    w2 = w2.at[:, 1, C:, :N].set(w[:, 2])
    w2 = w2.at[:, 1, :C, N:].set(w[:, 0])
    w2 = w2.at[:, 1, C:, N:].set(w[:, 1])
    w2 = w2.at[:, 2, :C, N:].set(w[:, 2])
    return w2


def supported_channels(C: int) -> bool:
    """Shapes the TPU kernel path accepts (interpret mode accepts any)."""
    return _interpret() or C % 128 == 0 or (2 * C) % 128 == 0


def fused_adaln_conv_layer(h: jnp.ndarray, mult: jnp.ndarray,
                           gate: jnp.ndarray, w: jnp.ndarray,
                           d: int) -> jnp.ndarray:
    """out = (h + conv2d_same(gelu(h*mult), w, dil=(d,1)) * gate) / sqrt(2).

    h: [B, F, T, C]; mult, gate: [B, C] f32; w: [5, 3, C, C]; d: freq dilation.
    For d >= 8 the conv is regrouped by residue class (one transpose each way,
    kernel runs d=1); the fused elementwise ops are all per-channel, so they
    commute with the regrouping. For C = 64 (sub-128 lanes, which Mosaic DMA
    cannot slice) time pairs are folded into lanes — a free reshape.
    """
    B, F, T, C = h.shape
    mult = mult.astype(jnp.float32)
    gate = gate.astype(jnp.float32)
    w = w.astype(h.dtype)

    def inner(z, m, g, dd):
        Bz, Fz, Tz, Cz = z.shape
        if not _interpret() and Cz % 128 != 0:
            assert (2 * Cz) % 128 == 0 and Tz % 2 == 0, \
                f"unsupported channel count {Cz} for the TPU megakernel"
            z2 = z.reshape(Bz, Fz, Tz // 2, 2 * Cz)
            m2 = jnp.concatenate([m, m], axis=-1)
            g2 = jnp.concatenate([g, g], axis=-1)
            y2 = _fused_layer(z2, m2, g2, _fold2_weights(w), dd)
            return y2.reshape(Bz, Fz, Tz, Cz)
        return _fused_layer(z, m, g, w, dd)

    if d >= 8 and F % d == 0:
        z = h.reshape(B, F // d, d, T, C).transpose(0, 2, 1, 3, 4)
        z = z.reshape(B * d, F // d, T, C)
        m2 = jnp.repeat(mult, d, axis=0)
        g2 = jnp.repeat(gate, d, axis=0)
        y = inner(z, m2, g2, 1)
        y = y.reshape(B, d, F // d, T, C).transpose(0, 2, 1, 3, 4)
        return y.reshape(B, F, T, C)
    return inner(h, mult, gate, d)
