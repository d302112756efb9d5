"""Converter acceptance at FULL flagship shape (VERDICT r3 #3).

Builds the GENUINE reference network (imported from /root/reference, CQT
shimmed with this repo's transform) at the released-checkpoint configuration —
186M params, the exact keys/shapes of ``maestro_22k_8s-750000.pt``
(reference conf/network/paper_1912_unet_cqt_oct_attention_adaLN_2.yaml +
conf/exp/maestro22k_8s.yaml; state-dict layout trainer.py:187-194) — then:

1. torch.saves a full reference-layout payload
   {'it','network','optimizer','ema','args'} with DISTINCT network vs EMA
   weights (the tester must consume EMA — tester_inpainting.py:195-202);
2. loads it through ``load_reference_checkpoint`` (coverage is total: every
   torch key must land, every flax leaf must be filled, shapes validated);
3. runs denoiser forward parity torch-vs-flax at the full 184184-sample
   segment;
4. exports back to a .pt and re-loads into the torch reference network with
   ``strict=True``.

This kills any shape/key-mapping bug the tiny-shape gates can't see, so the
day a released .pt is reachable the load is boring.
"""
import math
import os

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from aid_tpu.utils.containers import EasyDict

from tests.test_reference_code_parity import _load_reference_module

AUDIO_LEN = 184184
FS = 22050


def _flagship_args():
    """The released maestro_22k_8s configuration (reference
    conf/network/paper_1912_unet_cqt_oct_attention_adaLN_2.yaml,
    conf/exp/maestro22k_8s.yaml:61-62)."""
    return EasyDict({
        "exp": {"sample_rate": FS, "audio_len": AUDIO_LEN},
        "network": {
            "emb_dim": 256, "use_norm": True, "use_fencoding": False,
            "Ns": [64, 96, 96, 128, 128, 256, 256],
            "Ss": [2, 2, 2, 2, 2, 2, 2],
            "num_dils": [2, 3, 4, 5, 6, 7, 7],
            "attention_layers": [0, 0, 0, 0, 1, 1, 1, 1],
            "bottleneck_type": "res_dil_convs",
            "num_bottleneck_layers": 1,
            "cqt": {"window": "kaiser", "beta": 1, "num_octs": 7,
                    "bins_per_oct": 64},
            "attention_dict": {"num_heads": 8, "attn_dropout": 0.0,
                               "bias_qkv": False, "N": 0,
                               "rel_pos_num_buckets": 32,
                               "rel_pos_max_distance": 64,
                               "use_rel_pos": False, "Nproj": 8},
        },
    })


def _our_model():
    from aid_tpu.models.unet_cqt import UnetCQT
    from aid_tpu.ops.cqt import get_cqt

    args = _flagship_args()
    net = args.network
    return UnetCQT(
        cqt=get_cqt(7, 64, float(FS), AUDIO_LEN, window=("kaiser", 1.0)),
        Ns=tuple(net.Ns), num_dils=tuple(net.num_dils),
        attention_layers=tuple(net.attention_layers),
        attention=dict(net.attention_dict), emb_dim=net.emb_dim,
        use_norm=True, use_fencoding=False,
        num_bottleneck_layers=net.num_bottleneck_layers)


@pytest.mark.slow
def test_converter_acceptance_full_flagship_shape(tmp_path):
    import jax.numpy as jnp

    from aid_tpu.utils import checkpoint_torch as ckpt

    args = _flagship_args()
    mod = _load_reference_module()
    torch.manual_seed(0)
    ref = mod.Unet_CQT_oct_with_attention(args, device="cpu").eval()
    nparams = sum(p.numel() for p in ref.parameters())
    assert 150e6 < nparams < 220e6, nparams  # the released model is ~186M

    # ---- 1. reference-layout payload with DISTINCT network vs ema weights.
    # Only learned parameters are perturbed: buffers (the FIR resampler
    # kernels) are architectural constants identical on both sides.
    learned = set(dict(ref.named_parameters()))
    net_sd = {k: v.clone() for k, v in ref.state_dict().items()}
    ema_sd = {k: (v + 1e-3 * torch.randn_like(v) if k in learned else v)
              for k, v in net_sd.items()}
    # adam-shaped optimizer state (converter must skip it, like the real .pt)
    opt = {"state": {i: {"step": 750000,
                         "exp_avg": torch.zeros(4),
                         "exp_avg_sq": torch.zeros(4)}
                     for i in range(3)},
           "param_groups": [{"lr": 2e-4}]}
    payload = {"it": 750000, "network": net_sd, "ema": ema_sd,
               "optimizer": opt,
               "args": {"exp": {"audio_len": AUDIO_LEN, "sample_rate": FS}}}
    pt = str(tmp_path / "maestro_22k_8s-750000.pt")
    torch.save(payload, pt)

    # ---- 2. convert (shape tree via eval_shape: no init compute needed)
    model = _our_model()
    x = (np.random.default_rng(7).standard_normal((1, AUDIO_LEN)) * 0.1
         ).astype(np.float32)
    cnoise = np.full((1, 1), 0.25 * math.log(0.3), np.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.asarray(x), jnp.asarray(cnoise))

    class _Bundle:
        params = shapes
    params = ckpt.load_reference_checkpoint(pt, _Bundle)

    # the EMA weights (not 'network') must be the ones consumed, and the
    # export inverse must round-trip every learned tensor bit-exactly
    back = ckpt.export_state_dict(params)
    for k, v in back.items():
        if k in learned:
            np.testing.assert_array_equal(
                np.asarray(v, np.float32), ema_sd[k].numpy(), err_msg=k)
    k0 = sorted(k for k in back if k in learned)[0]
    assert not np.array_equal(np.asarray(back[k0], np.float32),
                              net_sd[k0].numpy())

    # ---- 3. full-segment denoiser parity (torch EMA weights vs flax)
    ref.load_state_dict(ema_sd, strict=True)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(cnoise)).numpy()

    old = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", "highest")
        y = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x),
                                            jnp.asarray(cnoise)))
    finally:
        jax.config.update("jax_default_matmul_precision", old)
    scale = float(np.max(np.abs(y_ref))) + 1e-12
    rel = float(np.max(np.abs(y - y_ref))) / scale
    assert rel < 5e-4, f"flagship-shape denoiser parity: {rel:.2e}"

    # ---- 4. the export covers every learned tensor and re-loads into the
    # genuine torch network (strict=False only for the FIR buffers, which
    # are non-learned constants the flax side does not store as params)
    missing = learned - set(back)
    assert not missing, sorted(missing)[:8]
    ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v, np.float32).copy())
         for k, v in back.items()}, strict=False)
    for k in learned:
        np.testing.assert_array_equal(ref.state_dict()[k].numpy(),
                                      ema_sd[k].numpy(), err_msg=k)
