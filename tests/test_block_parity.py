"""Numerical parity: AdaLNResBlock (flax, channels-last) vs an independent
torch implementation of the reference ResnetBlock equations
(networks/unet_cqt_oct_with_projattention_adaLN_2.py:382-493 forward math,
:314-380 projection attention, :137-163 bias-free group norm with torch-std
Bessel correction), fed with CONVERTED weights. Exercises, end to end, the
checkpoint converter's tensor layouts and every parity gotcha flagged in
SURVEY.md §7 (ddof=1 std, (gamma+1) scaling, /sqrt2 residuals, h-major
attention packing, exact-erf gelu).
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as tF

from aid_tpu.models.unet_cqt import AdaLNResBlock
from tests.test_checkpoint_convert import _inverse_key, _inverse_value

B, CIN, COUT, F, T, EMB = 2, 8, 16, 16, 12, 32
HEADS = 2


def _torch_groupnorm_biasfree(x, gamma, groups=8):
    # reference BiasFreeGroupNorm: divide by ddof=1 std over (gc, F, T), no
    # mean subtraction of x; learnable per-channel gamma
    n, c, f, t = x.shape
    g = groups
    xg = x.reshape(n, g, -1)
    std = xg.std(dim=2, unbiased=True, keepdim=True)
    xg = xg / (std + 1e-7)
    return xg.reshape(n, c, f, t) * gamma


def _torch_attention(x, sd, p, heads, fdim):
    # reference TimeAttentionBlock forward (networks:339-380)
    h = tF.conv2d(x, sd[p + "attn_block.proj_in.weight"])          # [B,H,F,T]
    z = h.reshape(h.shape[0], heads * fdim, h.shape[3])            # b (h f) t
    v = z.reshape(h.shape[0], heads, fdim, -1).permute(0, 1, 3, 2) # b h t f
    qk = tF.conv1d(z, sd[p + "attn_block.qk.weight"])
    qk = qk.reshape(z.shape[0], heads, 2 * fdim, -1).permute(0, 1, 3, 2)
    q, k = qk.chunk(2, dim=-1)
    sim = torch.einsum("bhnd,bhmd->bhnm", q, k) * (fdim ** -0.5)
    attn = sim.softmax(dim=-1)
    out = torch.einsum("bhnm,bhmd->bhnd", attn, v)                 # b h t f
    out = out.permute(0, 1, 3, 2)                                  # b h f t
    return tF.conv2d(out, sd[p + "attn_block.proj_out.weight"])


def _torch_resblock(x, emb, sd, num_dils, with_attention, fdim,
                    proj_place="before", dim_out=COUT):
    # reference ResnetBlock.forward (networks:450-493)
    p = ""
    input_x = x
    if p + "proj_in.weight" in sd:
        x = tF.conv2d(x, sd["proj_in.weight"])
    if with_attention:
        i_x = x
        gamma = emb @ sd["affine2.weight"].T + sd["affine2.bias"]
        scale = emb @ sd["gate2.weight"].T + sd["gate2.bias"]
        x = _torch_groupnorm_biasfree(x, sd["norm2.gamma"])
        x = x * (gamma[:, :, None, None] + 1)
        x = _torch_attention(x, sd, "", HEADS, fdim) * scale[:, :, None, None]
        x = (x + i_x) / math.sqrt(2.0)
    for i in range(num_dils):
        x0 = x
        x = _torch_groupnorm_biasfree(x, sd[f"norm.{i}.gamma"])
        gamma = emb @ sd[f"affine.{i}.weight"].T + sd[f"affine.{i}.bias"]
        scale = emb @ sd[f"gate.{i}.weight"].T + sd[f"gate.{i}.bias"]
        x = x * (gamma[:, :, None, None] + 1)
        w = sd[f"H.{i}.weight"]
        d = 2 ** i
        kh, kw = w.shape[2], w.shape[3]
        pad_h, pad_w = d * (kh - 1) // 2, (kw - 1) // 2
        conv = tF.conv2d(tF.gelu(x), w, dilation=(d, 1),
                         padding=(pad_h, pad_w))
        x = (x0 + conv * scale[:, :, None, None]) / math.sqrt(2.0)
    if proj_place == "after" and "proj_out.weight" in sd:
        x = tF.conv2d(x, sd["proj_out.weight"])
    if "res_conv.weight" in sd:
        input_x = tF.conv2d(input_x, sd["res_conv.weight"])
    return (x + input_x) / math.sqrt(2.0)


@pytest.mark.parametrize("with_attention", [False, True])
def test_resblock_matches_torch_reference(with_attention):
    attn = (dict(num_heads=HEADS, bias_qkv=False, use_rel_pos=False)
            if with_attention else None)
    block = AdaLNResBlock(dim_out=COUT, num_dils=2, use_norm=True,
                          attention=attn, fdim=F)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, F, T, CIN)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((B, EMB)), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, emb)
    y_flax = np.asarray(block.apply(params, x, emb))   # [B, F, T, C]

    # flax tree -> torch-layout tensors via the converter's inverse transforms
    flat = jax.tree_util.tree_flatten_with_path(params["params"])[0]
    sd = {}
    for path, v in flat:
        pk = tuple(k.key for k in path)
        # reuse the block-level key grammar: strip the synthetic top level
        key = _inverse_key(("down_0_res",) + pk)
        key = key.removeprefix("downs.0.2.")
        sd[key] = torch.from_numpy(np.asarray(_inverse_value(pk, v)).copy())

    xt = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2).copy())  # NCHW
    embt = torch.from_numpy(np.asarray(emb).copy())
    with torch.no_grad():
        y_t = _torch_resblock(xt, embt, sd, num_dils=2,
                              with_attention=with_attention, fdim=F)
    y_torch = y_t.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y_flax, y_torch, atol=2e-5, rtol=2e-4)
