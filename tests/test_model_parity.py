"""FULL-MODEL numerical parity: the flax UnetCQT vs an independent torch
implementation of the complete reference forward
(networks/unet_cqt_oct_with_projattention_adaLN_2.py:730-845) — per-octave
encoder with real-pair packing, the pyr auxiliary pyramid with its (5,3)
projections, FIR polyphase time resamplers (:510-580), bottleneck, the
dual-path X/Xout decoder with per-octave peel-off, projection attention with
T5 relative position bias (:266-380), and the RFF noise embedding (:167-211).

The torch model consumes CONVERTER-INVERTED weights, so this is the strongest
offline proxy for released-checkpoint parity (VERDICT round 1 #5): every
tensor layout the converter produces is exercised in the exact reference
dataflow. The CQT analysis/synthesis runs through the repo's own (separately
parity-gated) transform on both sides, since the reference's transform lives
in an external pip package.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from aid_tpu.models.unet_cqt import UnetCQT, _FIR_KERNELS
from aid_tpu.ops.cqt import get_cqt
from tests.test_checkpoint_convert import _inverse_key, _inverse_value

# tiny-but-complete configuration: 3 octaves, attention + rel-pos on the two
# deepest levels, mixed dilation counts, real FIR resampling between levels
O, BINS, LEN, FS = 3, 8, 2048, 4096.0
NS = (8, 16, 16)
NUM_DILS = (1, 2, 2)
ATT_LAYERS = (0, 1, 1, 1)
HEADS = 2
EMB = 32
SQ2 = math.sqrt(2.0)


# ---------------------------------------------------------------- torch model


def _groupnorm_biasfree(x, gamma, groups=8):
    n, c, f, t = x.shape
    g = min(groups, c)
    xg = x.reshape(n, g, -1)
    std = xg.std(dim=2, unbiased=True, keepdim=True)
    return (xg / (std + 1e-7)).reshape(n, c, f, t) * gamma


def _rel_pos_bias(table, n_q, n_k, num_buckets, max_distance):
    q_pos = torch.arange(n_k - n_q, n_k)
    k_pos = torch.arange(n_k)
    rel = k_pos[None, :] - q_pos[:, None]
    nb = num_buckets // 2
    ret = (rel >= 0).long() * nb
    n = rel.abs()
    max_exact = nb // 2
    is_small = n < max_exact
    val_large = max_exact + (
        torch.log(n.clamp(min=1).float() / max_exact)
        / math.log(max_distance / max_exact) * (nb - max_exact)).long()
    val_large = torch.minimum(val_large,
                              torch.full_like(val_large, nb - 1))
    buckets = ret + torch.where(is_small, n, val_large)
    return table[buckets].permute(2, 0, 1)[None]  # [1, H, Tq, Tk]


def _attention(x, sd, p, fdim):
    h = tF.conv2d(x, sd[p + "attn_block.proj_in.weight"])       # [B, H, F, T]
    B = h.shape[0]
    z = h.reshape(B, HEADS * fdim, -1)                          # b (h f) t
    v = z.reshape(B, HEADS, fdim, -1).permute(0, 1, 3, 2)       # b h t f
    qk = tF.conv1d(z, sd[p + "attn_block.qk.weight"])
    qk = qk.reshape(B, HEADS, 2 * fdim, -1).permute(0, 1, 3, 2)
    q, k = qk.chunk(2, dim=-1)
    sim = torch.einsum("bhnd,bhmd->bhnm", q, k)
    rp = p + "attn_block.rel_pos.relative_attention_bias.weight"
    if rp in sd:
        sim = sim + _rel_pos_bias(sd[rp], sim.shape[-2], sim.shape[-1],
                                  num_buckets=32, max_distance=64)
    sim = sim * (fdim ** -0.5)          # reference scales AFTER the bias add
    attn = sim.softmax(dim=-1)
    out = torch.einsum("bhnm,bhmd->bhnd", attn, v).permute(0, 1, 3, 2)
    return tF.conv2d(out, sd[p + "attn_block.proj_out.weight"])


def _resblock(x, emb, sd, p, num_dils, fdim=0, attention=False,
              proj_place="before"):
    """Reference ResnetBlock.forward (networks:450-493), key-prefix driven."""
    input_x = x
    if p + "proj_in.weight" in sd:
        x = tF.conv2d(x, sd[p + "proj_in.weight"])
    if attention:
        i_x = x
        gamma = emb @ sd[p + "affine2.weight"].T + sd[p + "affine2.bias"]
        scale = emb @ sd[p + "gate2.weight"].T + sd[p + "gate2.bias"]
        x = _groupnorm_biasfree(x, sd[p + "norm2.gamma"])
        x = x * (gamma[:, :, None, None] + 1)
        x = _attention(x, sd, p, fdim) * scale[:, :, None, None]
        x = (x + i_x) / SQ2
    for i in range(num_dils):
        x0 = x
        x = _groupnorm_biasfree(x, sd[p + f"norm.{i}.gamma"])
        gamma = emb @ sd[p + f"affine.{i}.weight"].T + sd[p + f"affine.{i}.bias"]
        scale = emb @ sd[p + f"gate.{i}.weight"].T + sd[p + f"gate.{i}.bias"]
        x = x * (gamma[:, :, None, None] + 1)
        w = sd[p + f"H.{i}.weight"]
        d = 2 ** i
        kh, kw = w.shape[2], w.shape[3]
        conv = tF.conv2d(tF.gelu(x), w, dilation=(d, 1),
                         padding=(d * (kh - 1) // 2, (kw - 1) // 2))
        x = (x0 + conv * scale[:, :, None, None]) / SQ2
    if proj_place == "after" and p + "proj_out.weight" in sd:
        x = tF.conv2d(x, sd[p + "proj_out.weight"])
    if p + "res_conv.weight" in sd:
        input_x = tF.conv2d(input_x, sd[p + "res_conv.weight"])
    return (x + input_x) / SQ2


def _resample_T(x, up):
    """Reference UpDownResample forward (networks:536-580): reflect pad +
    identity-diagonal conv1d(stride 2) / conv_transpose1d over the F-as-
    channels view."""
    taps = torch.tensor(_FIR_KERNELS["cubic"], dtype=torch.float32)
    pad = len(taps) // 2 - 1
    B, C, F_, T = x.shape
    z = x.reshape(-1, F_, T)
    w = torch.zeros(F_, F_, len(taps))
    idx = torch.arange(F_)
    w[idx, idx] = taps
    if not up:
        z = tF.pad(z, (pad, pad), mode="reflect")
        y = tF.conv1d(z, w, stride=2)
    else:
        z = tF.pad(z, ((pad + 1) // 2,) * 2, mode="reflect")
        y = tF.conv_transpose1d(z, w, stride=2, padding=pad * 2 + 1)
    return y.reshape(B, C, F_, -1)


def torch_unet_forward(audio_np, cnoise_np, sd, cqt):
    """The complete reference forward (networks:730-845), independently
    re-implemented; CQT analysis/synthesis via the repo transform."""
    cn = torch.from_numpy(cnoise_np)
    table = 2 * math.pi * cn * sd["embedding.RFF_freq"]
    emb = torch.cat([table.sin(), table.cos()], dim=1)
    for k in range(3):
        emb = tF.relu(emb @ sd[f"embedding.MLP.{k}.weight"].T
                      + sd[f"embedding.MLP.{k}.bias"])

    X_list = [np.asarray(x) for x in
              cqt.fwd(jnp.asarray(audio_np)[:, None, :])]

    hs = []
    X = pyr = None
    for i in range(O):
        c = X_list[O - 1 - i][:, 0]
        C = torch.from_numpy(
            np.stack([c.real, c.imag], axis=1).astype(np.float32))
        C2 = _resblock(C, emb, sd, f"downs.{i}.0.", num_dils=1)
        if i == 0:
            X = C2
            pyr = _resample_T(C, up=False)
        elif i < O - 1:
            pyr = torch.cat([_resample_T(C, up=False),
                             _resample_T(pyr, up=False)], dim=2)
            X = torch.cat([C2, X], dim=2)
        else:
            pyr = torch.cat([C, pyr], dim=2)
            X = torch.cat([C2, X], dim=2)
        X = _resblock(X, emb, sd, f"downs.{i}.2.", num_dils=NUM_DILS[i],
                      fdim=(i + 1) * BINS, attention=bool(ATT_LAYERS[i]))
        hs.append(X)
        if i < O - 1:
            X = _resample_T(X, up=False)
        X = (X + tF.conv2d(pyr, sd[f"downs.{i}.1.weight"],
                           padding=(2, 1))) / SQ2

    X = _resblock(X, emb, sd, "middle.0.1.", num_dils=NUM_DILS[-1],
                  fdim=O * BINS, attention=bool(ATT_LAYERS[-1]))
    Xout = _resblock(X, emb, sd, "middle.0.0.", num_dils=1,
                     proj_place="after")

    X_out_list = [None] * O
    for i in range(O):
        j = O - 1 - i
        skip = hs.pop()
        X = torch.cat([X, skip], dim=1)
        X = _resblock(X, emb, sd, f"ups.{i}.1.", num_dils=NUM_DILS[j],
                      fdim=(j + 1) * BINS, attention=bool(ATT_LAYERS[j]))
        Xout = (Xout + _resblock(X, emb, sd, f"ups.{i}.0.", num_dils=1,
                                 proj_place="after")) / SQ2
        out_rows, Xout = Xout[:, :, :BINS], Xout[:, :, BINS:]
        X = X[:, :, BINS:]
        r = out_rows.permute(0, 2, 3, 1).contiguous().numpy()
        X_out_list[i] = (r[..., 0] + 1j * r[..., 1])[:, None]
        if j > 0:
            X = _resample_T(X, up=True)
            Xout = _resample_T(Xout, up=True)

    pred = cqt.bwd([jnp.asarray(x) for x in X_out_list])[:, 0]
    return np.asarray(pred)[:, : audio_np.shape[-1]]


# ----------------------------------------------------------------------- test


def test_full_model_matches_torch_reference():
    cqt = get_cqt(O, BINS, FS, LEN)
    model = UnetCQT(
        cqt=cqt, Ns=NS, num_dils=NUM_DILS, attention_layers=ATT_LAYERS,
        attention=dict(num_heads=HEADS, bias_qkv=False, use_rel_pos=True,
                       rel_pos_num_buckets=32, rel_pos_max_distance=64),
        emb_dim=EMB, use_norm=True, use_fencoding=False)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((2, LEN)) * 0.1).astype(np.float32)
    cnoise = rng.standard_normal((2, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(audio),
                        jnp.asarray(cnoise))
    y_flax = np.asarray(model.apply(params, jnp.asarray(audio),
                                    jnp.asarray(cnoise)))

    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    sd = {}
    for path, v in flat:
        pk = tuple(k.key for k in path)
        sd[_inverse_key(pk)] = torch.from_numpy(
            np.asarray(_inverse_value(pk, v)).copy())

    with torch.no_grad():
        y_torch = torch_unet_forward(audio, cnoise, sd, cqt)

    assert y_flax.shape == y_torch.shape == audio.shape
    scale = float(np.abs(y_torch).max()) + 1e-12
    err = float(np.abs(y_flax - y_torch).max()) / scale
    assert err < 5e-4, f"relative max-abs err {err:.2e}"
    # outputs must be non-trivial for the comparison to mean anything
    assert float(np.abs(y_torch).max()) > 1e-4
