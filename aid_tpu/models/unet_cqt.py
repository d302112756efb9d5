"""Octave-CQT U-Net denoiser backbone (Flax), TPU-first layout.

Functional re-design of the reference backbone
``Unet_CQT_oct_with_attention`` (reference
networks/unet_cqt_oct_with_projattention_adaLN_2.py:583-845). Same computation
graph — checkpoint-convertible block for block — but engineered for TPU:

  * channels-LAST activations [B, F, T, C] so the channel dim maps onto MXU
    lanes (the reference uses torch NCHW);
  * every conv is ``lax.conv_general_dilated`` with static shapes; attention
    QK projections are plain matmuls (kernel-size-1 convs);
  * per-octave time axes are exact powers of two (guaranteed by
    aid_tpu.ops.cqt), so the FIR 2x resamplers and the encoder/decoder
    concatenations are all static-shape ops XLA can fuse;
  * norms/softmax run in f32 regardless of the compute dtype (bf16-safe).

Architecture map (reference file:line):
  RFFEmbedding           <- RFF_MLP_Block              networks:167-211
  BiasFreeGroupNorm      <- BiasFreeGroupNorm (ddof=1!) networks:137-163
  FreqEncodingRFF        <- AddFreqEncodingRFF         networks:213-263
  RelPositionBias        <- RelativePositionBias       networks:266-312
  TimeAttention          <- TimeAttentionBlock         networks:314-380
  AdaLNResBlock          <- ResnetBlock                networks:382-493
  resample_time          <- UpDownResample             networks:510-580
  UnetCQT                <- Unet_CQT_oct_with_attention networks:583-845
"""
from __future__ import annotations

import math
import os as _os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aid_tpu.ops.cqt import CQT, get_cqt

# --------------------------------------------------------------------------
# Initializers: reference uses kaiming_uniform scaled by sqrt(1/3) on the main
# path and by 1e-7 on gates (networks:20-25, :611-612 — "same as ADM").
# kaiming_uniform(fan_in) * s  ==  U(-1,1) * sqrt(3/fan_in) * s.


def scaled_uniform(scale: float):
    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 2:          # dense: (in, out)
            fan_in = shape[0]
        else:                        # conv HWIO: (kh, kw, in, out) or (kw, in, out)
            fan_in = int(np.prod(shape[:-1]))
        bound = math.sqrt(3.0 / fan_in) * scale
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


INIT_MAIN = scaled_uniform(math.sqrt(1.0 / 3.0))
INIT_GATE = scaled_uniform(1e-7)


class Dense(nn.Module):
    """Linear with reference init: weights kaiming-uniform, bias starts at 0."""
    features: int
    scale: float = math.sqrt(1.0 / 3.0)
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", scaled_uniform(self.scale), (x.shape[-1], self.features))
        y = jnp.dot(x.astype(self.dtype), k.astype(self.dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
            y = y + b.astype(self.dtype)
        return y


def _foldf_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(5,3,C,N) kernel -> (3,3,2C,2N) kernel of the freq-pair-folded conv:
    a (5,3) conv on [*,F,T,C] equals a (3,3) conv on [*,F/2,T,2C] (freq pairs
    packed into lanes). 1.2x nominal MACs for 2x lane width — a win when
    C < 128 leaves MXU lanes half-empty. Runtime transform of the SAME
    checkpoint param; differentiable for training."""
    kh, kw, C, N = w.shape
    w3 = jnp.zeros((3, kw, 2 * C, 2 * N), w.dtype)
    for s in (0, 1):          # output slot (f parity)
        for r in range(5):    # original freq tap
            q = s + r - 2
            pair_off, slot_in = q // 2, q % 2
            w3 = w3.at[pair_off + 1, :, slot_in * C:(slot_in + 1) * C,
                       s * N:(s + 1) * N].add(w[r])
    return w3


def _quant_mode(field: str) -> str:
    """Quantization mode with env override (AID_TPU_QUANT=none|int8)."""
    from aid_tpu.ops.qconv import quant_mode
    return quant_mode(field)


def _as_dense(w, dtype):
    """Materialize a kernel param: QWeight leaves (load-time prequantized
    int8, see qconv.prequantize_params) dequantize only on paths that need
    full precision; plain arrays just take the compute-dtype cast."""
    from aid_tpu.ops.qconv import QWeight, dequantize_kernel
    if isinstance(w, QWeight):
        return dequantize_kernel(w, dtype)
    return w.astype(dtype)


def _name_conv_out(y):
    """Tag a conv/dot output for the selective remat policy.

    ``checkpoint_name`` is a transparent identity everywhere except under
    ``nn.remat(..., policy=save_only_these_names("conv_out"))`` (training
    with network.remat_policy=conv), where it marks the MXU outputs as the
    residuals to stash — backward then recomputes only the cheap
    norm/gelu/gate elementwise chain instead of re-running the convs."""
    return jax.ad_checkpoint.checkpoint_name(y, "conv_out")


def _conv_same(x, w, dilation, q8: bool):
    """Stride-1 SAME NHWC conv, int8-quantized when q8 (serving hot path)."""
    if q8:
        from aid_tpu.ops.qconv import qconv
        return _name_conv_out(qconv(x, w, tuple(int(v) for v in dilation)))
    return _name_conv_out(jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC")))


class Conv2dFT(nn.Module):
    """Bias-free conv over (F, T) with freq dilation; input [B, F, T, C]."""
    features: int
    kernel: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    scale: float = math.sqrt(1.0 / 3.0)
    use_bias: bool = False
    foldf: bool = False   # freq-pair lane packing for narrow-channel convs
    quant: str = "none"   # int8: dynamic-quantized MXU path (serving only)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os
        mode = os.environ.get("AID_TPU_CONV_MODE", "auto")  # perf experiments
        q8 = _quant_mode(self.quant) == "int8"
        kh, kw = self.kernel
        from aid_tpu.ops.qconv import QWeight
        w = self.param("kernel", scaled_uniform(self.scale),
                       (kh, kw, x.shape[-1], self.features))
        x = x.astype(self.dtype)
        is_qw = isinstance(w, QWeight)
        if is_qw and not q8:
            is_qw, w = False, _as_dense(w, self.dtype)
        if not is_qw:
            w = w.astype(self.dtype)
        d = self.dilation[0]
        if (kh, kw) == (1, 1) and self.dilation == (1, 1):
            # 1x1 convs as plain dots: a matmul has no spatial-layout
            # preference, so XLA stops inserting relayout copies around the
            # proj_in / res_conv / out-block projections
            if q8:
                from aid_tpu.ops.qconv import qdot
                y = qdot(x, w if is_qw else w[0, 0])
            else:
                y = jnp.einsum("bftc,cn->bftn", x, w[0, 0])
            y = _name_conv_out(y)
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros_init(),
                               (self.features,))
                y = y + b.astype(self.dtype)
            return y
        B, F, T, C = x.shape
        if (mode != "direct"
                and self.foldf and (kh, kw) == (5, 3) and self.dilation[1] == 1
                and C <= 64 and F % d == 0 and (F // d) % 2 == 0):
            # regroup residue classes (dilated -> plain per class), then fold
            # freq pairs into lanes so C=64 convs use all 128 MXU lanes
            N = self.features
            if d > 1:
                z = x.reshape(B, F // d, d, T, C).transpose(0, 2, 1, 3, 4)
                z = z.reshape(B * d, F // d, T, C)
            else:
                z = x
            Bz, Fz = z.shape[0], z.shape[1]
            z = z.reshape(Bz, Fz // 2, 2, T, C)
            z = z.transpose(0, 1, 3, 2, 4).reshape(Bz, Fz // 2, T, 2 * C)
            y = _conv_same(z, _foldf_weights(w).astype(self.dtype),
                           (1, 1), q8)
            y = y.reshape(Bz, Fz // 2, T, 2, N)
            y = y.transpose(0, 1, 3, 2, 4).reshape(Bz, Fz, T, N)
            if d > 1:
                y = y.reshape(B, d, F // d, T, N)
                y = y.transpose(0, 2, 1, 3, 4).reshape(B, F, T, N)
        elif (mode != "direct"
              and d >= 8 and self.dilation[1] == 1 and F % d == 0):
            # measured on v5e: direct rhs_dilation convs are fine for small d
            # (0.3-0.5 ms at flagship shapes) and regrouping only wins at
            # large d where the dilated footprint gets cache-hostile
            # Freq-dilated conv as residue-class regrouping: output bin f only
            # mixes bins f + d*k, i.e. its own residue class mod d — so a
            # dilation-d conv over F equals a PLAIN conv over F/d applied to
            # each of the d classes (folded into the batch). TPU convs with
            # large rhs_dilation lower poorly; plain convs with d-times the
            # batch map cleanly onto the MXU. SAME padding of 2d ends becomes
            # SAME padding of 2 per class, exactly.
            z = x.reshape(B, F // d, d, T, C).transpose(0, 2, 1, 3, 4)
            z = z.reshape(B * d, F // d, T, C)
            y = _conv_same(z, w, (1, 1), q8)
            y = y.reshape(B, d, F // d, T, self.features)
            y = y.transpose(0, 2, 1, 3, 4).reshape(B, F, T, self.features)
        else:
            y = _conv_same(x, w, self.dilation, q8)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
            y = y + b.astype(self.dtype)
        return y


class BiasFreeGroupNorm(nn.Module):
    """x / (std + eps) * gamma, std over (group-channels, F, T), NO mean removal.

    Matches reference networks:137-163 exactly, including the Bessel correction
    (torch ``.std`` defaults to ddof=1) — a checkpoint-parity gotcha flagged in
    SURVEY.md section 7. Always computed in f32.
    """
    num_groups: int = 8
    eps: float = 1e-7

    @nn.compact
    def __call__(self, x):
        B, F, T, C = x.shape
        g = min(self.num_groups, C)
        gamma = self.param("gamma", nn.initializers.ones_init(), (C,))
        xf = x.astype(jnp.float32).reshape(B, F, T, g, C // g)
        n = F * T * (C // g)
        # single-pass moments (XLA fuses both reductions into one sweep);
        # Bessel correction keeps torch-.std ddof=1 parity
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        sq = jnp.mean(xf * xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.maximum(sq - mean * mean, 0.0) * (n / (n - 1.0))
        std = jnp.sqrt(var)
        y = (xf / (std + self.eps)).reshape(B, F, T, C)
        return (y * gamma.astype(jnp.float32)).astype(x.dtype)


class RFFEmbedding(nn.Module):
    """Noise-level embedding: fixed random Fourier features + 3-layer ReLU MLP.

    Reference RFF_MLP_Block networks:167-211. The 32 RFF frequencies are drawn
    once (16 * N(0,1)) and FROZEN (requires_grad=False there); here the param is
    wrapped in stop_gradient so a plain optimizer never moves it while it still
    lives in the checkpoint.
    """
    emb_dim: int = 256
    rff_dim: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, cnoise):  # cnoise: [B, 1]
        freqs = self.param("rff_freq", lambda k, s: 16.0 * jax.random.normal(k, s),
                           (1, self.rff_dim))
        freqs = jax.lax.stop_gradient(freqs)
        table = 2.0 * jnp.pi * cnoise.astype(jnp.float32) * freqs
        x = jnp.concatenate([jnp.sin(table), jnp.cos(table)], axis=-1)
        for i, feat in enumerate([128, 256, self.emb_dim]):
            x = nn.relu(Dense(feat, dtype=self.dtype, name=f"mlp_{i}")(x))
        return x  # [B, emb_dim]


class FreqEncodingRFF(nn.Module):
    """Fixed RFF frequency-positional channels, concatenated per octave.

    Reference AddFreqEncodingRFF networks:213-263 (only used when
    ``use_fencoding`` is on; flagship config has it off).
    """
    f_dim: int
    n_freq: int = 32

    @nn.compact
    def __call__(self, x):  # x: [B, F, T, C]
        freqs = self.param("rff_freq", lambda k, s: 16.0 * jax.random.normal(k, s),
                           (1, self.n_freq))
        freqs = jax.lax.stop_gradient(freqs)
        pos = jnp.arange(self.f_dim, dtype=jnp.float32)[None, None, :]
        table = 2.0 * jnp.pi * pos * freqs[..., None]          # [1, n, F]
        emb = jnp.concatenate([jnp.sin(table), jnp.cos(table)], axis=1)  # [1, 2n, F]
        B, F, T, _ = x.shape
        emb = jnp.broadcast_to(emb.transpose(0, 2, 1)[:, :, None, :], (B, F, T, 2 * self.n_freq))
        return jnp.concatenate([x, emb.astype(x.dtype)], axis=-1)


class RelPositionBias(nn.Module):
    """T5-style bucketed relative position bias (reference networks:266-312)."""
    num_buckets: int
    max_distance: int
    num_heads: int

    @nn.compact
    def __call__(self, n_q: int, n_k: int):
        q_pos = jnp.arange(n_k - n_q, n_k)
        k_pos = jnp.arange(n_k)
        rel = k_pos[None, :] - q_pos[:, None]
        nb = self.num_buckets // 2
        ret = (rel >= 0).astype(jnp.int32) * nb
        n = jnp.abs(rel)
        max_exact = nb // 2
        is_small = n < max_exact
        val_large = max_exact + (
            jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
            / math.log(self.max_distance / max_exact) * (nb - max_exact)
        ).astype(jnp.int32)
        val_large = jnp.minimum(val_large, nb - 1)
        buckets = ret + jnp.where(is_small, n, val_large)
        table = self.param("embedding", nn.initializers.normal(1.0),
                           (self.num_buckets, self.num_heads))
        bias = table[buckets]                      # [Tq, Tk, H]
        return bias.transpose(2, 0, 1)[None]       # [1, H, Tq, Tk]


class TimeAttention(nn.Module):
    """Projection attention along time (reference TimeAttentionBlock networks:314-380).

    Channels are first collapsed to ``num_heads`` via a 1x1 conv; frequency is
    folded into the head feature dim; V is the identity of that projection.
    Softmax(QK^T * Fdim^-0.5) runs in f32.
    """
    channels: int
    fdim: int
    num_heads: int = 8
    bias_qkv: bool = False
    use_rel_pos: bool = False
    rel_pos_num_buckets: int = 32
    rel_pos_max_distance: int = 64
    context_parallel: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, F, T, C]
        B, F, T, C = x.shape
        H = self.num_heads
        h = Conv2dFT(H, (1, 1), dtype=self.dtype, name="proj_in")(x)   # [B, F, T, H]
        # h-major channel packing (h f), as in the reference rearranges.
        z = h.transpose(0, 2, 3, 1).reshape(B, T, H * F)               # [B, T, (h f)]
        v = z.reshape(B, T, H, F).transpose(0, 2, 1, 3)                # [B, H, T, F]
        qk = Dense(2 * H * F, scale=math.sqrt(1 / 3), use_bias=self.bias_qkv,
                   dtype=self.dtype, name="qk")(z)                     # [B, T, (h 2F)]
        qk = qk.reshape(B, T, H, 2 * F).transpose(0, 2, 1, 3)          # [B, H, T, 2F]
        q, k = jnp.split(qk, 2, axis=-1)
        bias = (RelPositionBias(self.rel_pos_num_buckets,
                                self.rel_pos_max_distance, H,
                                name="rel_pos")(T, T)
                if self.use_rel_pos else None)
        from aid_tpu.parallel.ring_attention import get_cp_mesh, ring_attention
        cp = get_cp_mesh() if self.context_parallel else None
        if cp is not None and T % cp.shape["cp"] == 0:
            # time axis sharded over the cp ring (SURVEY section 5: the
            # idiomatic scaling story past the octave-CQT time halving).
            # NB the reference applies the F^-0.5 scale AFTER the bias add,
            # so the bias is pre-scaled here.
            out = ring_attention(
                q, k, v, cp,
                bias=None if bias is None else bias * float(F) ** -0.5,
                scale=float(F) ** -0.5).astype(self.dtype)
        else:
            sim = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                             k.astype(jnp.float32))
            if bias is not None:
                sim = sim + bias
            sim = sim * (float(F) ** -0.5)
            attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)               # [B, H, T, F]
        out = out.transpose(0, 3, 2, 1)                                # [B, F, T, H]
        return Conv2dFT(C, (1, 1), dtype=self.dtype, name="proj_out")(out)


class NormGain(nn.Module):
    """Owner of the norm gain param when a merged/fused path bypasses the
    BiasFreeGroupNorm module (same param path: <name>/gamma —
    checkpoint-identical)."""
    features: int

    @nn.compact
    def __call__(self):
        return self.param("gamma", nn.initializers.ones_init(), (self.features,))


class ConvParam(nn.Module):
    """Owner of a conv kernel param for stack formulations that consume the
    raw kernel directly (packed/folded/banded variants; same param path:
    <name>/kernel — checkpoint-identical with Conv2dFT's)."""
    features: int
    in_features: int
    kernel: Tuple[int, int] = (5, 3)
    scale: float = math.sqrt(1.0 / 3.0)

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel
        return self.param("kernel", scaled_uniform(self.scale),
                          (kh, kw, self.in_features, self.features))


def _gelu(x, variant: str = "erf"):
    """GELU with a switchable approximation (config ``network.gelu``,
    env override AID_TPU_GELU=erf|tanh|sigmoid for experiments).

    The reference uses torch F.gelu's default exact erf (networks:482). The
    erf polynomial is VPU-bound at flagship activation sizes (the norm+gelu
    loop fusions run ~3x their HBM roofline): measured 67.7 -> 58.6 ms per
    guided score (1.79 -> 2.07x RT) switching erf -> tanh on the 22k
    flagship. ``erf`` remains available for bit-level checkpoint parity."""
    import os
    v = os.environ.get("AID_TPU_GELU", variant)
    if v == "tanh":
        return jax.nn.gelu(x, approximate=True)
    if v == "sigmoid":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


def _pack_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """[B,F,T,C] -> [B,F/2,T,2C]: adjacent freq rows folded into lanes."""
    B, F, T, C = x.shape
    z = x.reshape(B, F // 2, 2, T, C).transpose(0, 1, 3, 2, 4)
    return z.reshape(B, F // 2, T, 2 * C)


def _unpack_pairs(z: jnp.ndarray) -> jnp.ndarray:
    B, F2, T, C2 = z.shape
    C = C2 // 2
    y = z.reshape(B, F2, T, 2, C).transpose(0, 1, 3, 2, 4)
    return y.reshape(B, 2 * F2, T, C)


def _packed_even_d_weights(w: jnp.ndarray) -> jnp.ndarray:
    """(5,3,C,N) -> dense block-diagonal (5,3,2C,2N): for EVEN dilation d the
    taps preserve freq parity, so the dilation-d conv on [B,F,T,C] equals
    this kernel with rhs_dilation (d/2,1) on the pair-packed tensor. 2x MACs
    (half the kernel is zeros) buys full 128-lane occupancy at C=64 and, more
    importantly, zero per-layer pack/unpack transposes."""
    kh, kw, C, N = w.shape
    wd = jnp.zeros((kh, kw, 2 * C, 2 * N), w.dtype)
    wd = wd.at[:, :, :C, :N].set(w)
    wd = wd.at[:, :, C:, N:].set(w)
    return wd


def _norm_adaln_scale_packed(z, gain, aff, eps: float = 1e-7,
                             groups: int = 8):
    """_norm_adaln_scale on a pair-packed tensor [B,F/2,T,2C]: the group-std
    reduces over exactly the same element sets as the unpacked layout (both
    parity slots of each channel group), and the combined multiplier is the
    unpacked one tiled across the two slots."""
    B, F2, T, C2 = z.shape
    C = C2 // 2
    g = min(groups, C)
    zf = z.reshape(B, F2, T, 2, g, C // g)
    n = F2 * T * 2 * (C // g)
    m1 = jnp.mean(zf, axis=(1, 2, 3, 5), dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(zf), axis=(1, 2, 3, 5), dtype=jnp.float32)
    var = jnp.maximum(m2 - m1 * m1, 0.0) * (n / (n - 1.0))
    std = jnp.sqrt(var)                                          # [B, G]
    mult = (gain.astype(jnp.float32).reshape(1, g, C // g)
            / (std[:, :, None] + eps)).reshape(B, C)
    mult = mult * (1.0 + aff.astype(jnp.float32))
    mult2 = jnp.concatenate([mult, mult], axis=-1)               # both slots
    return z * mult2[:, None, None, :].astype(z.dtype)


def _regroup_transition(x: jnp.ndarray, from_d: int, to_d: int,
                        B: int) -> jnp.ndarray:
    """Move between residue-class-regrouped layouts with ONE copy.

    Layout-d is [B*d, F/d, T, C] with batch ordered (B, class), class =
    f mod d (matching a fresh regroup: reshape (B, F/d, d, ...) then class ->
    batch). Chaining d -> 2d (or any multiple) replaces the per-layer
    regroup+ungroup pair — two full-tensor copies — with one."""
    if from_d == to_d:
        return x
    Bd, Fd, T, C = x.shape
    if from_d == 1:
        z = x.reshape(B, Fd // to_d, to_d, T, C).transpose(0, 2, 1, 3, 4)
        return z.reshape(B * to_d, Fd // to_d, T, C)
    if to_d == 1:
        z = x.reshape(B, from_d, Fd, T, C).transpose(0, 2, 1, 3, 4)
        return z.reshape(B, Fd * from_d, T, C)
    assert to_d % from_d == 0, (from_d, to_d)
    r = to_d // from_d
    # f = from_d*m + c1, m = r*m2 + j  =>  class2 = from_d*j + c1
    z = x.reshape(B, from_d, Fd // r, r, T, C).transpose(0, 3, 1, 2, 4, 5)
    return z.reshape(B * to_d, Fd // r, T, C)


def _fold_enter(x: jnp.ndarray, from_d: int, to_d: int, B: int) -> jnp.ndarray:
    """Unfolded layout-from_d [B*from_d, F/from_d, T, C] -> FOLDED layout-to_d
    [B*to_d, T, (F/to_d)*C] in one transpose.

    Folded layout-d holds each residue class's remaining freq rows
    (m = f // d, slot-major) in the LANE dim next to the channels. With
    Fz = F/d <= 4 rows left, the 5-tap freq conv there is mostly SAME
    padding (60% wasted MACs at Fz=2) and XLA re-lays the tensor around
    every pad/slice; folding removes the freq axis entirely — the layer
    becomes a 3-tap TIME conv with a block-banded [3, Fz*C, Fz*N] kernel
    (see _folded_band_weights), exactly equal to the dilated conv."""
    Bd, Fm, T, C = x.shape
    r = to_d // from_d
    Fz2 = Fm // r
    # f = from_d*m + c, m = m2*r + j  =>  class2 = from_d*j + c, slot m2
    z = x.reshape(B, from_d, Fz2, r, T, C).transpose(0, 3, 1, 4, 2, 5)
    return z.reshape(B * to_d, T, Fz2 * C)


def _fold_split(x: jnp.ndarray, from_d: int, to_d: int, B: int,
                Fz_from: int) -> jnp.ndarray:
    """Folded layout-d -> folded layout-(d*r), one transpose."""
    Bd, T, FC = x.shape
    C = FC // Fz_from
    r = to_d // from_d
    Fz2 = Fz_from // r
    z = x.reshape(B, from_d, T, Fz2, r, C).transpose(0, 4, 1, 2, 3, 5)
    return z.reshape(B * to_d, T, Fz2 * C)


def _fold_exit(x: jnp.ndarray, d: int, B: int, Fz: int) -> jnp.ndarray:
    """Folded layout-d [B*d, T, Fz*C] -> plain [B, F, T, C], one transpose."""
    Bd, T, FC = x.shape
    C = FC // Fz
    z = x.reshape(B, d, T, Fz, C).transpose(0, 3, 1, 2, 4)
    return z.reshape(B, Fz * d, T, C)


def _chain_transition(x: jnp.ndarray, from_d: int, from_fold: bool,
                      to_d: int, to_fold: bool, B: int, F: int) -> jnp.ndarray:
    """Move between any two chain-stack layouts (regrouped / folded)."""
    if not from_fold and not to_fold:
        return _regroup_transition(x, from_d, to_d, B)
    if not from_fold and to_fold:
        return _fold_enter(x, from_d, to_d, B)
    if from_fold and to_fold:
        return _fold_split(x, from_d, to_d, B, F // from_d)
    y = _fold_exit(x, from_d, B, F // from_d)
    return _regroup_transition(y, 1, to_d, B)


def _folded_band_weights(w: jnp.ndarray, Fz: int) -> jnp.ndarray:
    """(kh,kw,C,N) freq-conv kernel -> block-banded (kw, Fz*C, Fz*N) TIME-conv
    kernel on the folded layout: output slot fo gathers input slots fi with
    |fi-fo| <= kh//2 through freq tap k = fi-fo+kh//2 — exactly the SAME-padded
    plain conv over the Fz remaining rows (band structure encodes the edge
    clipping, so no pad/slice ops and no zero-tap MACs beyond the band)."""
    kh, kw, C, N = w.shape
    half = kh // 2
    wf = jnp.zeros((kw, Fz * C, Fz * N), w.dtype)
    for fo in range(Fz):
        for fi in range(max(0, fo - half), min(Fz, fo + half + 1)):
            wf = wf.at[:, fi * C:(fi + 1) * C, fo * N:(fo + 1) * N].set(
                w[fi - fo + half])
    return wf


def _norm_adaln_scale_folded(h, gain, aff, B: int, d: int, Fz: int,
                             eps: float = 1e-7, groups: int = 8):
    """_norm_adaln_scale on a folded tensor [B*d, T, Fz*C]: the group std
    reduces over all d class-batches, T, and all Fz lane slots of each
    original (batch, channel-group) — the same element sets as the plain
    layout — and the multiplier tiles across slots / repeats across classes."""
    Bd, T, FC = h.shape
    C = FC // Fz
    g = min(groups, C)
    hf = h.reshape(B, d, T, Fz, g, C // g)
    n = d * T * Fz * (C // g)
    m1 = jnp.mean(hf, axis=(1, 2, 3, 5), dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(hf), axis=(1, 2, 3, 5), dtype=jnp.float32)
    var = jnp.maximum(m2 - m1 * m1, 0.0) * (n / (n - 1.0))
    std = jnp.sqrt(var)                                           # [B, G]
    mult = (gain.astype(jnp.float32).reshape(1, g, C // g)
            / (std[:, :, None] + eps)).reshape(B, C)
    mult = mult * (1.0 + aff.astype(jnp.float32))
    mult = jnp.tile(mult, (1, Fz))                                # [B, Fz*C]
    mult = jnp.repeat(mult, d, axis=0)                            # [B*d, ..]
    return h * mult[:, None, :].astype(h.dtype)


def _norm_adaln_scale_regrouped(h, gain, aff, B: int, d: int,
                                eps: float = 1e-7, groups: int = 8):
    """_norm_adaln_scale on a residue-regrouped tensor [B*d, F/d, T, C]:
    the group std reduces across all d class-batches of each ORIGINAL batch
    item (same element sets as the ungrouped layout)."""
    Bd, Fd, T, C = h.shape
    g = min(groups, C)
    hf = h.reshape(B, d, Fd, T, g, C // g)
    n = d * Fd * T * (C // g)
    m1 = jnp.mean(hf, axis=(1, 2, 3, 5), dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(hf), axis=(1, 2, 3, 5), dtype=jnp.float32)
    var = jnp.maximum(m2 - m1 * m1, 0.0) * (n / (n - 1.0))
    std = jnp.sqrt(var)                                           # [B, G]
    mult = (gain.astype(jnp.float32).reshape(1, g, C // g)
            / (std[:, :, None] + eps)).reshape(B, C)
    mult = mult * (1.0 + aff.astype(jnp.float32))
    mult = jnp.repeat(mult, d, axis=0)                            # [B*d, C]
    return h * mult[:, None, None, :].astype(h.dtype)


def _group_std_f32(x: jnp.ndarray, groups: int = 8) -> jnp.ndarray:
    """Bessel-corrected std over (F, T, C/G) per (batch, group), reduced in
    f32 regardless of x.dtype (the BiasFreeGroupNorm reduction, torch .std
    ddof=1 semantics). Returns [B, G] f32."""
    B, F, T, C = x.shape
    g = min(groups, C)  # tiny test configs; real configs always have C >= 64
    xf = x.reshape(B, F, T, g, C // g)
    n = F * T * (C // g)
    m1 = jnp.mean(xf, axis=(1, 2, 4), dtype=jnp.float32)
    m2 = jnp.mean(jnp.square(xf), axis=(1, 2, 4), dtype=jnp.float32)
    var = jnp.maximum(m2 - m1 * m1, 0.0) * (n / (n - 1.0))
    return jnp.sqrt(var)


def _norm_adaln_scale(x, gain, aff, eps: float = 1e-7, groups: int = 8):
    """One-pass equivalent of BiasFreeGroupNorm followed by the adaLN
    (1 + affine) modulation: x * [(gain / (std+eps)) * (1+aff)] — the combined
    per-(batch, channel) multiplier is tiny, so the activation tensor is
    touched ONCE instead of twice (this chain is HBM-bound on TPU)."""
    B, F, T, C = x.shape
    g = min(groups, C)
    std = _group_std_f32(x, g)                                   # [B, G]
    mult = (gain.astype(jnp.float32).reshape(1, g, C // g)
            / (std[:, :, None] + eps)).reshape(B, C)
    mult = mult * (1.0 + aff.astype(jnp.float32))
    return x * mult[:, None, None, :].astype(x.dtype)


class AdaLNResBlock(nn.Module):
    """Dilated freq-conv stack with adaLN sigma-conditioning (reference ResnetBlock
    networks:382-493): per-layer ``x*(affine(emb)+1)`` scale and zero-init
    ``gate(emb)`` output scale, residuals divided by sqrt(2); optional
    projection-attention sub-block before the conv stack.
    """
    dim_out: int
    num_dils: int = 6
    kernel: Tuple[int, int] = (5, 3)
    use_norm: bool = True
    proj_place: str = "before"   # 'after' in decoder out-blocks
    attention: Optional[dict] = None
    fdim: int = 0
    use_pallas: bool = False     # fused norm+adaLN+gelu kernel (ops.pallas)
    conv_foldf: bool = False     # freq-pair lane packing for C<=64 convs
    pack_stack: bool = False     # persistent pair-packed dilated stack (C<=64)
    chain_regroup: bool = False  # chained residue regroup for the d>=8 tail
    chain_stride: int = 2        # layout transitions every k dilation-doublings
    gelu: str = "erf"            # erf (reference-exact) | tanh | sigmoid
    quant: str = "none"          # int8: dynamic-quantized MXU serving path
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb):  # x: [B, F, T, C], emb: [B, E]
        dim_in = x.shape[-1]
        q8 = _quant_mode(self.quant) == "int8"
        N = self.dim_out if self.proj_place == "before" else dim_in
        h = (Conv2dFT(N, (1, 1), quant=self.quant, dtype=self.dtype,
                      name="proj_in")(x) if dim_in != N else x)

        if self.attention is not None:
            a = self.attention
            i_h = h
            gamma = Dense(N, dtype=self.dtype, name="affine_attn")(emb)
            scale = Dense(N, scale=1e-7, dtype=self.dtype, name="gate_attn")(emb)
            if self.use_norm:
                ng = NormGain(N, name="norm_attn")()
                h = _norm_adaln_scale(h, ng, gamma)
            else:
                h = h * (gamma[:, None, None, :] + 1.0)
            h = TimeAttention(
                channels=N, fdim=self.fdim, num_heads=a.get("num_heads", 8),
                bias_qkv=a.get("bias_qkv", False),
                use_rel_pos=a.get("use_rel_pos", False),
                rel_pos_num_buckets=a.get("rel_pos_num_buckets", 32),
                rel_pos_max_distance=a.get("rel_pos_max_distance", 64),
                context_parallel=a.get("context_parallel", False),
                dtype=self.dtype, name="attn")(h) * scale[:, None, None, :]
            h = (h + i_h) / math.sqrt(2.0)

        # Layout-persistent stack (perf experiment, AID_TPU_STACK_MODE=tf):
        # hold the whole dilated loop in [B, T, F, C] so the freq-dilated
        # convs see their dilated dim on the sublanes with ONE transpose pair
        # per stack instead of XLA re-laying-out around every conv.
        import os as _os
        stack_env = _os.environ.get("AID_TPU_STACK_MODE", "")
        modes = set(stack_env.split(",")) if stack_env else None
        plain_ok = (self.kernel == (5, 3) and self.num_dils > 0
                    and not self.use_pallas)

        def want(name, flag):
            return (name in modes) if modes is not None else flag

        # pair-packed persistent stack for narrow-channel levels: pack ONCE,
        # d=1 via the folded (3,3) kernel, even d via the block-diagonal
        # packed kernel — no per-layer transposes (the foldf path pays two
        # per layer)
        pack_stack = (want("pack", self.pack_stack) and plain_ok
                      and h.shape[-1] <= 64 and h.shape[1] % 2 == 0
                      and self.use_norm)
        # chained residue regroup for the d>=8 tail: one layout transition
        # d -> 2d between large-dilation layers instead of a regroup+ungroup
        # pair around every one
        chain_stack = (want("chain", self.chain_regroup) and plain_ok
                       and not pack_stack and self.use_norm
                       and self.num_dils >= 4)
        Bsz, F_entry = h.shape[0], h.shape[1]
        cur_d, cur_fold = 1, False
        if pack_stack:
            h = _pack_pairs(h)

        # smallest dilation the chain regroups. Swept on the 22k flagship
        # (AID_TPU_CHAIN_MIN_D): 8 -> 2.091x RT, 4 -> 2.103x, 2 -> 2.116x —
        # regrouped plain convs beat direct rhs_dilation convs at EVERY d
        # once the per-layer regroup copies are chained away.
        chain_min_d = int(_os.environ.get("AID_TPU_CHAIN_MIN_D", "2"))
        if chain_min_d & (chain_min_d - 1) or chain_min_d < 1:
            raise ValueError(
                f"AID_TPU_CHAIN_MIN_D={chain_min_d} must be a power of two: "
                "chain targets are dilation levels 2^i, and a non-power-of-"
                "two floor would silently truncate local_d = d/target.")
        # deepest chain levels fold the Fz = F/d remaining freq rows into the
        # lane dim when Fz <= this (AID_TPU_CHAIN_FOLD_MAX, 0 disables): the
        # 5-tap freq conv there is mostly SAME padding, and the folded form is
        # an exact 3-tap time conv with a block-banded kernel — fewer MACs,
        # no pad/slice, no relayout copies.
        fold_max = int(_os.environ.get("AID_TPU_CHAIN_FOLD_MAX", "4"))
        # AID_TPU_CHAIN_STRIDE=k: transition layouts only every k dilation-
        # doublings and run the in-between layers as LOCAL dilated convs
        # (dilation d/layout <= 2^(k-1)) in the held layout — trades
        # transition copies for dilated-conv lowering. Swept on the 22k
        # flagship (bench.py): 1 -> 2.03x, 2 -> 2.058x, 3 -> 1.922x; local
        # dilation 2 is cheaper than a layout transition, 4 is not. Exact
        # at every k (test_chain_stride_matches_default).
        chain_stride = int(_os.environ.get("AID_TPU_CHAIN_STRIDE",
                                           str(self.chain_stride)))
        local_d = 1
        for i in range(self.num_dils):
            if chain_stack:
                d_i = 2 ** i
                if d_i >= chain_min_d and F_entry % d_i == 0:
                    # layouts aligned to even i ({2},{4,8},{16,32},{64}).
                    # The greedy phasing ({2,4},{8,16},{32,64} — one fewer
                    # transition, one more local conv) was MEASURED SLOWER
                    # (1.923x vs 2.058x): its local-2 convs sit in
                    # shallower layouts with more freq rows, where the
                    # dilated footprint is cache-hostile again.
                    if chain_stride > 1:
                        target = min(max(2 ** (chain_stride * (i // chain_stride)),
                                         chain_min_d), d_i)
                    else:
                        target = d_i
                else:
                    target = 1
                local_d = d_i // target if target > 1 else 1
                tgt_fold = (target > 1 and not q8 and local_d == 1
                            and F_entry // target <= fold_max)
                if _os.environ.get("AID_TPU_DEBUG_STACK"):
                    print(f"[stack] {self.name} layer {i}: d={target} "
                          f"local={local_d} fold={tgt_fold} F={F_entry} "
                          f"C={N}", flush=True)
                if (target, tgt_fold) != (cur_d, cur_fold):
                    h = _chain_transition(h, cur_d, cur_fold, target,
                                          tgt_fold, Bsz, F_entry)
                    cur_d, cur_fold = target, tgt_fold
            h0 = h
            gamma = Dense(N, dtype=self.dtype, name=f"affine_{i}")(emb)
            scale = Dense(N, scale=1e-7, dtype=self.dtype, name=f"gate_{i}")(emb)
            if chain_stack and cur_fold:
                Fz = F_entry // cur_d
                ng = NormGain(N, name=f"norm_{i}")()
                g = _gelu(_norm_adaln_scale_folded(h, ng, gamma, Bsz,
                                                   cur_d, Fz), self.gelu)
                wk = _as_dense(ConvParam(N, N, name=f"conv_{i}")(), self.dtype)
                y = _name_conv_out(jax.lax.conv_general_dilated(
                    g, _folded_band_weights(wk, Fz), (1,), "SAME",
                    dimension_numbers=("NWC", "WIO", "NWC")))
                sc = jnp.repeat(jnp.tile(scale, (1, Fz)), cur_d, axis=0)
                h = (h0 + y * sc[:, None, :]) / math.sqrt(2.0)
                continue
            if chain_stack and cur_d > 1:
                ng = NormGain(N, name=f"norm_{i}")()
                g = _gelu(
                    _norm_adaln_scale_regrouped(h, ng, gamma, Bsz, cur_d),
                    self.gelu)
                wk = ConvParam(N, N, name=f"conv_{i}")()
                from aid_tpu.ops.qconv import QWeight as _QW
                if not (q8 and isinstance(wk, _QW)):
                    wk = _as_dense(wk, self.dtype)
                y = _conv_same(g, wk, (local_d, 1), q8)
                scale_r = jnp.repeat(scale, cur_d, axis=0)
                h = (h0 + y * scale_r[:, None, None, :]) / math.sqrt(2.0)
                continue
            if pack_stack:
                ng = NormGain(N, name=f"norm_{i}")()
                g = _gelu(_norm_adaln_scale_packed(h, ng, gamma), self.gelu)
                wk = ConvParam(N, N, name=f"conv_{i}")().astype(self.dtype)
                d = 2 ** i
                if d == 1:
                    y = _conv_same(g, _foldf_weights(wk), (1, 1), q8)
                else:
                    y = _conv_same(g, _packed_even_d_weights(wk),
                                   (d // 2, 1), q8)
                scale2 = jnp.concatenate([scale, scale], axis=-1)
                h = (h0 + y * scale2[:, None, None, :]) / math.sqrt(2.0)
                continue
            if self.use_pallas and self.use_norm:
                from aid_tpu.ops.pallas.fused_adaln import (group_std,
                                                            norm_adaln_gelu)
                ng = NormGain(N, name=f"norm_{i}")()
                g = norm_adaln_gelu(h, group_std(h, 8), ng,
                                    gamma.astype(jnp.float32), 1e-7, 8
                                    ).astype(self.dtype)
            elif self.use_norm:
                ng = NormGain(N, name=f"norm_{i}")()
                g = _gelu(_norm_adaln_scale(h, ng, gamma), self.gelu)
            else:
                h2 = h * (gamma[:, None, None, :] + 1.0)
                g = _gelu(h2, self.gelu)
            h = Conv2dFT(N, self.kernel, dilation=(2 ** i, 1), dtype=self.dtype,
                         foldf=self.conv_foldf, quant=self.quant,
                         name=f"conv_{i}")(g)
            h = (h0 + h * scale[:, None, None, :]) / math.sqrt(2.0)

        if pack_stack:
            h = _unpack_pairs(h)
        if chain_stack and (cur_d > 1 or cur_fold):
            h = _chain_transition(h, cur_d, cur_fold, 1, False, Bsz, F_entry)

        if self.proj_place == "after" and N != self.dim_out:
            h = Conv2dFT(self.dim_out, (1, 1), quant=self.quant,
                         dtype=self.dtype, name="proj_out")(h)
        res = (Conv2dFT(self.dim_out, (1, 1), quant=self.quant,
                        dtype=self.dtype, name="res_conv")(x)
               if dim_in != self.dim_out else x)
        return (h + res) / math.sqrt(2.0)


# --------------------------------------------------------------------------
# FIR polyphase 2x time resampling (reference UpDownResample networks:510-580).
# Same kernels, same reflect padding, same (un)normalized transpose-conv gain:
# the upsampler's per-phase DC gain is 0.5 by design there — preserved, since
# trained decoders compensate for it.

_FIR_KERNELS = {
    "linear": [1 / 8, 3 / 8, 3 / 8, 1 / 8],
    "cubic": [-0.01171875, -0.03515625, 0.11328125, 0.43359375,
              0.43359375, 0.11328125, -0.03515625, -0.01171875],
    "lanczos3": [0.003689131001010537, 0.015056144446134567, -0.03399861603975296,
                 -0.066637322306633, 0.13550527393817902, 0.44638532400131226,
                 0.44638532400131226, 0.13550527393817902, -0.066637322306633,
                 -0.03399861603975296, 0.015056144446134567, 0.003689131001010537],
}


def resample_time(x: jnp.ndarray, up: bool, kernel: str = "cubic") -> jnp.ndarray:
    """2x FIR up/down-sampling along the T axis of [B, F, T, C].

    Polyphase with reflect padding, identical semantics to torch's
    reflect-pad + conv1d(stride 2) / conv_transpose1d recipe (the reference's
    resampler, networks:549-580) — verified tap-for-tap in tests.

    TPU-first formulation: instead of collapsing (B,F,C) into a giant
    single-channel conv batch, each polyphase tap is a shifted slice of the
    original [B,F,T,C] array and the output is a k-term FMA chain — pure VPU
    elementwise work on the native layout that XLA fuses into neighbors.
    """
    taps = _FIR_KERNELS[kernel]
    k = len(taps)
    pad = k // 2 - 1
    B, F, T, C = x.shape
    x = x.reshape(B * F, T, C)
    if not up:
        # depthwise strided conv: ONE read/write pass over the tensor (an
        # unrolled slice-FMA chain profiled at ~60 GB/s effective — XLA
        # materialized every shifted slice; feature_group_count=C convs read
        # once)
        w = jnp.broadcast_to(jnp.asarray(taps, x.dtype)[:, None, None],
                             (k, 1, C))
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        y = jax.lax.conv_general_dilated(
            xp, w, window_strides=(2,), padding="VALID",
            feature_group_count=C,
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y.reshape(B, F, T // 2, C)
    p = (pad + 1) // 2
    w = jnp.broadcast_to(jnp.asarray(taps[::-1], x.dtype)[:, None, None],
                         (k, 1, C))
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        xp, w, window_strides=(1,), padding=[(0, 0)], lhs_dilation=(2,),
        feature_group_count=C,
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y.reshape(B, F, 2 * T, C)


# --------------------------------------------------------------------------


def _cp_constrain(x: jnp.ndarray) -> jnp.ndarray:
    """Pin the frame-time axis of a [B, F, T, C] activation to the cp mesh.

    Full-score context parallelism (network.context_parallel): with these
    pins at the octave entries and after each time-resample, XLA's SPMD
    partitioner keeps every activation time-sharded through the whole U-Net
    — convs get halo exchanges (kernel width 3 in T), the FIR resamplers get
    boundary halos, GroupNorm stats get one small psum — and attention rides
    the ring (TimeAttention + attention_dict.context_parallel). Other dims
    stay UNCONSTRAINED so dp batch sharding composes. No-op when no cp mesh
    is installed or T is not divisible by the cp size (deep levels of a
    short clip): GSPMD then picks layouts freely, still correct.
    """
    from aid_tpu.parallel.ring_attention import CP_AXIS, get_cp_mesh
    mesh = get_cp_mesh()
    if mesh is None:
        return x
    n = int(mesh.shape[CP_AXIS])
    if n <= 1 or x.ndim != 4 or x.shape[2] % n != 0:
        return x
    from jax.sharding import NamedSharding, PartitionSpec as P
    U = P.UNCONSTRAINED
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(U, U, CP_AXIS, U)))


_logged_formulations: set = set()


def _log_effective_formulation(net: "UnetCQT") -> None:
    """Print the EFFECTIVE kernel-formulation knobs once per distinct value.

    The AID_TPU_* env overrides exist for perf A/Bs, but a stray one silently
    changes the compiled program; every build states what it actually uses so
    benched numbers are attributable (VERDICT r3 weak #4)."""
    eff = (
        ("conv_mode", _os.environ.get("AID_TPU_CONV_MODE", "auto")),
        ("stack_mode", _os.environ.get("AID_TPU_STACK_MODE", "")
         or ("pack" if net.pack_stack else "")
         or ("chain" if net.chain_regroup else "plain")),
        ("chain_min_d", _os.environ.get("AID_TPU_CHAIN_MIN_D", "2")),
        ("chain_fold_max", _os.environ.get("AID_TPU_CHAIN_FOLD_MAX", "4")),
        ("chain_stride", _os.environ.get("AID_TPU_CHAIN_STRIDE",
                                         str(net.chain_stride))),
        ("gelu", _os.environ.get("AID_TPU_GELU", net.gelu)),
        ("quant", _os.environ.get("AID_TPU_QUANT", net.quant)),
        ("dtype", jnp.dtype(net.dtype).name),
        ("remat", net.remat),
        ("remat_policy", net.remat_policy),
    )
    if eff not in _logged_formulations:
        _logged_formulations.add(eff)
        overrides = sorted(k for k in _os.environ if k.startswith("AID_TPU_"))
        print("[aid_tpu] formulation: "
              + " ".join(f"{k}={v}" for k, v in eff)
              + (f"  (env overrides active: {', '.join(overrides)})"
                 if overrides else ""),
              flush=True)


class UnetCQT(nn.Module):
    """The full octave U-Net denoiser (reference forward networks:730-845).

    __call__(audio [B, T], cnoise [B, 1]) -> audio [B, T]. The CQT transform is
    a static (non-learned) member: its index tables compile into the program.
    """
    cqt: CQT
    Ns: Sequence[int]
    num_dils: Sequence[int]
    attention_layers: Sequence[int]
    attention: dict
    emb_dim: int = 256
    use_norm: bool = True
    use_fencoding: bool = False
    num_bottleneck_layers: int = 1
    remat: bool = False   # rematerialize each res block (trade FLOPs for HBM
    remat_policy: str = "block"  # block: stash only block inputs; conv: stash
    #   conv/dot outputs too and recompute only the elementwise chain
    use_pallas: bool = False  # fused norm+adaLN+gelu pallas kernel
    conv_foldf: bool = False  # freq-pair lane packing for C<=64 convs
    pack_stack: bool = False  # persistent pair-packed stacks at C<=64 levels
    chain_regroup: bool = False  # chained d>=8 residue regroup in the stacks
    chain_stride: int = 2        # per-model layout-transition stride
    gelu: str = "erf"         # erf (reference-exact) | tanh | sigmoid
    quant: str = "none"       # int8: dynamic-quantized MXU serving path
    context_parallel: bool = False  # full-score time sharding over the cp mesh
    dtype: Any = jnp.float32  # in guidance backprops / large-batch training)

    @nn.compact
    def __call__(self, audio: jnp.ndarray, cnoise: jnp.ndarray) -> jnp.ndarray:
        _log_effective_formulation(self)
        O = self.cqt.num_octs
        bins = self.cqt.bins_per_oct
        import functools as _ft
        if not self.remat:
            BlockCls = AdaLNResBlock
        elif self.remat_policy == "conv":
            BlockCls = nn.remat(
                AdaLNResBlock,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out"))
        elif self.remat_policy == "block":
            BlockCls = nn.remat(AdaLNResBlock)
        else:
            raise ValueError(
                f"network.remat_policy={self.remat_policy!r}: expected "
                "'block' or 'conv'")
        Block = _ft.partial(
            BlockCls,
            use_pallas=self.use_pallas,
            conv_foldf=self.conv_foldf, pack_stack=self.pack_stack,
            chain_regroup=self.chain_regroup,
            chain_stride=self.chain_stride, gelu=self.gelu,
            quant=self.quant)
        emb = RFFEmbedding(self.emb_dim, dtype=self.dtype, name="embedding")(cnoise)

        # analysis: list low->high octave of complex [B, 1, bins, M_j]
        X_list = self.cqt.fwd(audio[:, None, :])

        def to_real(c):  # complex [B,1,bins,M] -> [B, F=bins, T=M, C=2]
            r = jnp.stack([c.real, c.imag], axis=-1)[:, 0]
            r = r.astype(self.dtype)
            return _cp_constrain(r) if self.context_parallel else r

        def attn_cfg(flag):
            return dict(self.attention) if flag else None

        hs = []
        X = None
        pyr = None
        for i in range(O):
            C = to_real(X_list[O - 1 - i])
            C2 = (FreqEncodingRFF(bins, name=f"fenc_{i}")(C)
                  if self.use_fencoding else C)
            C2 = Block(
                dim_out=self.Ns[i] if i == 0 else self.Ns[i - 1],
                num_dils=1, kernel=(1, 1), use_norm=self.use_norm,
                dtype=self.dtype, name=f"down_{i}_init")(C2, emb)
            if i == 0:
                X = C2
                pyr = C
            else:
                pyr = jnp.concatenate([C, pyr], axis=1)
                X = jnp.concatenate([C2, X], axis=1)

            X = Block(
                dim_out=self.Ns[i], num_dils=self.num_dils[i],
                use_norm=self.use_norm, attention=attn_cfg(self.attention_layers[i]),
                fdim=(i + 1) * bins, dtype=self.dtype, name=f"down_{i}_res")(X, emb)
            hs.append(X)
            if i < O - 1:
                # ONE downsample for the main path and the raw-CQT pyramid:
                # the resampler is row- AND channel-independent, so
                # down(cat_c(X, pyr)) == (down(X), down(pyr)) exactly —
                # halves the resampler dispatches on the encoder side (the
                # pyramid's own freq-concat fold is the same trick, axis=1)
                nC = X.shape[-1]
                both = resample_time(
                    jnp.concatenate([X, pyr], axis=-1), up=False)
                if self.context_parallel:
                    both = _cp_constrain(both)
                X, pyr = both[..., :nC], both[..., nC:]
            X = (X + Conv2dFT(self.Ns[i], (5, 3), quant=self.quant,
                              dtype=self.dtype,
                              name=f"down_{i}_pyr")(pyr)) / math.sqrt(2.0)

        # bottleneck
        Xout = None
        for m in range(self.num_bottleneck_layers):
            X = Block(
                dim_out=self.Ns[-1], num_dils=self.num_dils[-1],
                use_norm=self.use_norm,
                attention=attn_cfg(self.attention_layers[-1]),
                fdim=O * bins, dtype=self.dtype, name=f"mid_{m}_res")(X, emb)
            Xout = Block(
                dim_out=2, num_dils=1, kernel=(1, 1), use_norm=self.use_norm,
                proj_place="after", dtype=self.dtype, name=f"mid_{m}_out")(X, emb)

        # decoder: peel one octave per level back to complex coefficients
        X_out_list = [None] * O
        for i in range(O):
            oct_idx = O - 1 - i  # octave-construction index of this level
            skip = hs.pop()
            X = jnp.concatenate([X, skip], axis=-1)
            X = Block(
                dim_out=self.Ns[oct_idx - 1] if oct_idx > 0 else self.Ns[0],
                num_dils=self.num_dils[oct_idx], use_norm=self.use_norm,
                attention=attn_cfg(self.attention_layers[oct_idx]),
                fdim=(oct_idx + 1) * bins, dtype=self.dtype,
                name=f"up_{i}_res")(X, emb)
            Xout = (Xout + Block(
                dim_out=2, num_dils=1, kernel=(1, 1), use_norm=self.use_norm,
                proj_place="after", dtype=self.dtype,
                name=f"up_{i}_out")(X, emb)) / math.sqrt(2.0)

            out_rows, Xout = Xout[:, :bins], Xout[:, bins:]
            X = X[:, bins:]
            r = out_rows.astype(jnp.float32)
            X_out_list[i] = jax.lax.complex(r[..., 0], r[..., 1])[:, None]  # [B,1,bins,M]
            if i < O - 1:
                # ONE upsample for the dual decoder paths (exact: the FIR
                # resampler is channel-independent)
                nC = X.shape[-1]
                both = resample_time(
                    jnp.concatenate([X, Xout], axis=-1), up=True)
                if self.context_parallel:
                    both = _cp_constrain(both)
                X, Xout = both[..., :nC], both[..., nC:]

        pred = self.cqt.bwd(X_out_list)[:, 0]
        return pred[:, : audio.shape[-1]].astype(jnp.float32)


# --------------------------------------------------------------------------


def build_unet(args, device=None) -> UnetCQT:
    """Factory with the reference constructor contract (args tree + device),
    resolved by the registry from the config's ``callable:`` key
    (reference utils/setup.py:46-53)."""
    net = args.network
    win = (("kaiser", net.cqt.beta) if net.cqt.window == "kaiser" else net.cqt.window)
    dtype = jnp.bfloat16 if str(getattr(net, "compute_dtype", "float32")) == "bfloat16" \
        else jnp.float32
    cqt = get_cqt(net.cqt.num_octs, net.cqt.bins_per_oct, args.exp.sample_rate,
                  args.exp.audio_len, window=win)
    attention = dict(net.attention_dict) if hasattr(net, "attention_dict") else {}
    return UnetCQT(
        cqt=cqt,
        Ns=tuple(net.Ns),
        num_dils=tuple(net.num_dils),
        attention_layers=tuple(net.attention_layers),
        attention=attention,
        emb_dim=net.emb_dim,
        use_norm=net.use_norm,
        use_fencoding=net.use_fencoding,
        num_bottleneck_layers=getattr(net, "num_bottleneck_layers", 1),
        remat=bool(net.get("remat", False)),
        remat_policy=str(net.get("remat_policy", "block")),
        use_pallas=bool(net.get("use_pallas_fused", False)),
        conv_foldf=bool(net.get("conv_foldf", False)),
        pack_stack=bool(net.get("conv_pack_stack", False)),
        chain_regroup=bool(net.get("conv_chain_regroup", False)),
        chain_stride=int(net.get("chain_stride", 2)),
        gelu=str(net.get("gelu", "erf")),
        quant=str(net.get("quant", "none")),
        context_parallel=bool(net.get("context_parallel", False)),
        dtype=dtype,
    )
