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

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-12


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


def _qconv_impl(x: jnp.ndarray, w: jnp.ndarray,
                dilation: Tuple[int, int]) -> jnp.ndarray:
    xq, sx = _quant_tensor(x)
    wq, sw = _quant_per_out_channel(w)
    y = lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def qconv(x: jnp.ndarray, w: jnp.ndarray,
          dilation: Tuple[int, int] = (1, 1)) -> jnp.ndarray:
    """SAME, stride-1, NHWC/HWIO int8 conv with freq (rhs) dilation.

    Requires odd kernel dims (every conv on the aid_tpu hot path is (5,3),
    (3,3) or (1,1)): SAME padding is then symmetric, so the input cotangent
    is exactly a SAME conv of the output cotangent with the spatially
    rotated, channel-transposed kernel at the same dilation.
    """
    return _qconv_impl(x, w, dilation)


def _qconv_fwd(x, w, dilation):
    return _qconv_impl(x, w, dilation), (x, w)


def _qconv_bwd(dilation, res, g):
    x, w = res
    wt = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)        # [kh,kw,N,C]
    dx = _qconv_impl(g, wt, dilation)
    return dx.astype(x.dtype), jnp.zeros_like(w)


qconv.defvjp(_qconv_fwd, _qconv_bwd)


@jax.custom_vjp
def qdot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[..., C] @ [C, N] in int8 (the 1x1-conv-as-dot hot path)."""
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


qdot.defvjp(_qdot_fwd, _qdot_bwd)
