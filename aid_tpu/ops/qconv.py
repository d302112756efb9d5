"""Dynamic int8 quantized conv/dot for TPU serving.

v5e's MXU executes int8 x int8 -> int32 at twice the bf16 rate and int8
operands halve the HBM bytes of every conv read. For the guided-inpainting
hot path (reference edm_sampler_inpainting.py:178-262: 2T-1 forward AND
backward denoiser passes per segment) both directions run on the MXU, so
both directions are quantized here:

  fwd:  y  = conv(q8(x), q8_oc(w)) * (sx * sw)     per-tensor x (dynamic),
                                                   per-out-channel w
  bwd:  dx = conv(q8(g), q8_oc(rot180(w)^T)) * ... same scheme, custom_vjp

The error is symmetric-quantization roundoff. Reconstruction guidance is
scale-invariant in the gradient (the reference normalizes by ||g||,
edm_sampler_inpainting.py:87), so backward quantization noise perturbs only
the gradient DIRECTION, bounded by the same roundoff.

Weight cotangents come back as zeros: this path is inference-only. Training
keeps the bf16/f32 path (aid_tpu.training.trainer refuses quantized
networks), because zero dw would silently freeze learning.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_EPS = 1e-12


def quant_mode(field: str) -> str:
    """Quantization mode with env override (AID_TPU_QUANT=none|int8)."""
    return os.environ.get("AID_TPU_QUANT", field or "none")


def _quant_tensor(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-SAMPLE (leading-axis) symmetric int8: (q, scale[B,1,...,1]).

    Per-sample rather than per-tensor scales keep every batch row's
    quantization independent of its batchmates — serving results must not
    change with batch padding/composition (convs never mix rows, so the
    dequant stays exact), and quiet rows aren't crushed by a loud row's
    range."""
    ax = jnp.abs(x.astype(jnp.float32))
    s = jnp.max(ax, axis=tuple(range(1, x.ndim)), keepdims=True)
    s = jnp.maximum(s / 127.0, _EPS)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def _quant_per_out_channel(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 over the LAST axis of w."""
    aw = jnp.abs(w.astype(jnp.float32))
    axes = tuple(range(w.ndim - 1))
    s = jnp.maximum(jnp.max(aw, axis=axes) / 127.0, _EPS)    # [N]
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


class QWeight(NamedTuple):
    """A conv/dot kernel prequantized at load time (serving only).

    Production int8 serving quantizes weights ONCE, offline: the dynamic
    path re-reads the full-precision kernel and re-derives (q, scale) inside
    every compiled score call — per guided score that is an extra
    full-precision weight read plus a quantize write/read on HBM, for bytes
    that never change. ``prequantize_params`` bakes both directions:

      q/s   — the forward kernel, per-out-channel symmetric int8
      qt/st — the spatially rotated, channel-transposed kernel the input
              cotangent needs (see ``qconv``), quantized on ITS out channels

    so a guided sampler reads int8 weights straight from HBM in fwd AND bwd.
    """
    q: jnp.ndarray    # int8 [kh, kw, C, N]
    s: jnp.ndarray    # f32  [N]
    qt: jnp.ndarray   # int8 [kh, kw, N, C]
    st: jnp.ndarray   # f32  [C]


def prequantize_kernel(w: jnp.ndarray, dtype: Any = jnp.bfloat16) -> QWeight:
    """QWeight for a [kh,kw,C,N] kernel, bit-identical to the dynamic path
    (which quantizes AFTER the compute-dtype cast, unet_cqt.Conv2dFT)."""
    wc = w.astype(dtype)
    q, s = _quant_per_out_channel(wc)
    wt = jnp.flip(wc, axis=(0, 1)).swapaxes(2, 3)
    qt, st = _quant_per_out_channel(wt)
    return QWeight(q, s, qt, st)


def dequantize_kernel(qw: QWeight, dtype: Any = jnp.bfloat16) -> jnp.ndarray:
    return (qw.q.astype(jnp.float32) * qw.s).astype(dtype)


def _prequant_eligible(path, leaf) -> bool:
    """Kernel leaves safe to replace with QWeight.

    Only Conv2dFT/ConvParam kernels are 4-D ``kernel`` leaves. Kernels with
    C_in <= 64 and spatial taps are EXCLUDED: those are the foldf/pack-stack
    levels, whose conv consumes a *derived* kernel (_foldf_weights /
    _packed_even_d_weights) that must be rebuilt from full precision. They
    are also the smallest kernels, so dynamic quantization is cheap there.
    """
    key = getattr(path[-1], "key", None)
    if key != "kernel" or getattr(leaf, "ndim", 0) != 4:
        return False
    kh, kw, cin, _ = leaf.shape
    if (kh, kw) == (1, 1):
        return True
    return cin > 64


def prequantize_params(params, dtype: Any = jnp.bfloat16):
    """Replace eligible kernel leaves of a flax param pytree with QWeight.

    flax retrieves apply-time params without validation, so QWeight leaves
    flow through Module.apply untouched; Conv2dFT dispatches on the type.
    The returned tree is for INFERENCE param slots only (trainer refuses
    quantized networks — weight cotangents are zero by design).
    """
    def visit(path, leaf):
        if _prequant_eligible(path, leaf):
            return prequantize_kernel(leaf, dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def _qconv_impl(x: jnp.ndarray, w: jnp.ndarray,
                dilation: Tuple[int, int]) -> jnp.ndarray:
    xq, sx = _quant_tensor(x)
    wq, sw = _quant_per_out_channel(w)
    y = lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(x.dtype)


def _qconv_pre_impl(x: jnp.ndarray, q: jnp.ndarray, s: jnp.ndarray,
                    dilation: Tuple[int, int]) -> jnp.ndarray:
    xq, sx = _quant_tensor(x)
    y = lax.conv_general_dilated(
        xq, q, (1, 1), "SAME", rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * s)).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _qconv_prequant(x: jnp.ndarray, qw: QWeight,
                    dilation: Tuple[int, int]) -> jnp.ndarray:
    return _qconv_pre_impl(x, qw.q, qw.s, dilation)


def _qconv_prequant_fwd(x, qw, dilation):
    return _qconv_pre_impl(x, qw.q, qw.s, dilation), (qw.qt, qw.st)


def _zero_qweight_cot(qt, st):
    # int8 leaves take float0 cotangents; scale leaves take ordinary zeros.
    # qt is [kh,kw,N,C]: fwd q is [kh,kw,C,N] with s [N]; st is [C].
    f0 = jax.dtypes.float0
    return QWeight(np.zeros(qt.swapaxes(2, 3).shape, f0),
                   jnp.zeros((qt.shape[2],), st.dtype),
                   np.zeros(qt.shape, f0), jnp.zeros_like(st))


def _qconv_prequant_bwd(dilation, res, g):
    qt, st = res
    dx = _qconv_pre_impl(g, qt, st, dilation)
    return dx, _zero_qweight_cot(qt, st)


_qconv_prequant.defvjp(_qconv_prequant_fwd, _qconv_prequant_bwd)


def qconv(x: jnp.ndarray, w, dilation: Tuple[int, int] = (1, 1)) -> jnp.ndarray:
    """SAME, stride-1, NHWC/HWIO int8 conv with freq (rhs) dilation.

    ``w`` is either a full-precision [kh,kw,C,N] kernel (quantized
    dynamically per call) or a load-time ``QWeight``. Requires odd kernel
    dims (every conv on the aid_tpu hot path is (5,3), (3,3) or (1,1)):
    SAME padding is then symmetric, so the input cotangent is exactly a
    SAME conv of the output cotangent with the spatially rotated,
    channel-transposed kernel at the same dilation.
    """
    d = tuple(int(v) for v in dilation)
    if isinstance(w, QWeight):
        return _qconv_prequant(x, w, d)
    return _qconv_dyn(x, w, d)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _qconv_dyn(x: jnp.ndarray, w: jnp.ndarray,
               dilation: Tuple[int, int]) -> jnp.ndarray:
    return _qconv_impl(x, w, dilation)


def _qconv_fwd(x, w, dilation):
    return _qconv_impl(x, w, dilation), (x, w)


def _qconv_bwd(dilation, res, g):
    x, w = res
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)        # [kh,kw,N,C]
    dx = _qconv_impl(g, wt, dilation)
    return dx.astype(x.dtype), jnp.zeros_like(w)


_qconv_dyn.defvjp(_qconv_fwd, _qconv_bwd)


def qdot(x: jnp.ndarray, w) -> jnp.ndarray:
    """[..., C] @ [C, N] in int8 (the 1x1-conv-as-dot hot path).

    ``w`` is a full-precision [C, N] matrix or a (1,1)-kernel ``QWeight``.
    """
    if isinstance(w, QWeight):
        return _qdot_prequant(x, w)
    return _qdot_dyn(x, w)


def _qdot_pre_impl(x, q2, s):
    xq, sx = _quant_tensor(x)
    y = lax.dot_general(xq, q2, (((x.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * s)).astype(x.dtype)


@jax.custom_vjp
def _qdot_prequant(x: jnp.ndarray, qw: QWeight) -> jnp.ndarray:
    return _qdot_pre_impl(x, qw.q[0, 0], qw.s)


def _qdot_prequant_fwd(x, qw):
    return _qdot_pre_impl(x, qw.q[0, 0], qw.s), (qw.qt, qw.st)


def _qdot_prequant_bwd(res, g):
    qt, st = res
    dx = _qdot_pre_impl(g, qt[0, 0], st)
    return dx, _zero_qweight_cot(qt, st)


_qdot_prequant.defvjp(_qdot_prequant_fwd, _qdot_prequant_bwd)


@jax.custom_vjp
def _qdot_dyn(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    return _qdot_impl(x, w)


def _qdot_impl(x, w):
    xq, sx = _quant_tensor(x)
    wq, sw = _quant_per_out_channel(w)
    y = lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(x.dtype)


def _qdot_fwd(x, w):
    return _qdot_impl(x, w), (x, w)


def _qdot_bwd(res, g):
    x, w = res
    dx = _qdot_impl(g, w.T)
    return dx.astype(x.dtype), jnp.zeros_like(w)


_qdot_dyn.defvjp(_qdot_fwd, _qdot_bwd)
