"""Differential parity against the GENUINE reference implementation.

tests/test_model_parity.py proves our flax denoiser against an independent
torch re-implementation of the reference equations. This file goes further:
it imports the ACTUAL reference network code (read-only checkout at
/root/reference, torch CPU), shims its one external dependency
(`cqt_nsgt_pytorch`) with this repo's CQT (both sides then share the same
analysis/synthesis, so the comparison isolates everything else: convs,
norms, adaLN, attention, resamplers, pyramid path, decoder assembly, and the
checkpoint-name converter), and asserts end-to-end forward parity through
converter-mapped weights.

Skipped automatically when the reference checkout is absent (e.g. CI
elsewhere) — the independent-reimplementation parity test still guards the
math there.
"""
import math
import os
import sys
import types

import numpy as np
import pytest

REF_NET = "/root/reference/networks/unet_cqt_oct_with_projattention_adaLN_2.py"
pytestmark = pytest.mark.skipif(not os.path.exists(REF_NET),
                                reason="reference checkout not available")

TINY = dict(num_octs=3, bins_per_oct=8, fs=4096.0, audio_len=2048)


def _install_shims():
    """cqt_nsgt_pytorch -> this repo's CQT, bridged as DIFFERENTIABLE torch
    autograd.Functions (backward = the CQT's jax VJP; torch hands backward
    the conjugate-Wirtinger grad, jax.vjp wants its conjugate — verified by
    the gradcheck test below). This lets the genuine reference sampler run
    reconstruction guidance (torch.autograd.grad through the denoiser incl.
    the transform) on top of this repo's transform. torchaudio -> empty
    module (imported but unused by the network file)."""
    import jax
    import jax.numpy as jnp
    import torch

    from aid_tpu.ops.cqt import get_cqt

    def _to_np(t):
        return t.detach().cpu().numpy()

    class CQT_nsgt:  # noqa: N801 - must match the reference import name
        def __init__(self, numocts, binsoct, mode="oct", window="hann",
                     fs=44100, audio_len=44100, dtype=None, device=None):
            assert mode == "oct"
            win = tuple(window) if isinstance(window, (list, tuple)) else window
            cqt = self.cqt = get_cqt(int(numocts), int(binsoct), float(fs),
                                     int(audio_len), window=win)

            class _Fwd(torch.autograd.Function):
                @staticmethod
                def forward(ctx, x):
                    y, vjp = jax.vjp(cqt.fwd, jnp.asarray(_to_np(x)))
                    ctx.vjp = vjp
                    return tuple(torch.from_numpy(np.array(c)) for c in y)

                @staticmethod
                def backward(ctx, *gs):
                    cts = [jnp.asarray(np.conj(_to_np(g))) for g in gs]
                    (dx,) = ctx.vjp(cts)
                    return torch.from_numpy(np.array(dx))

            class _Bwd(torch.autograd.Function):
                @staticmethod
                def forward(ctx, *coeffs):
                    arrs = [jnp.asarray(_to_np(c)) for c in coeffs]
                    y, vjp = jax.vjp(cqt.bwd, arrs)
                    ctx.vjp = vjp
                    return torch.from_numpy(np.array(y))

                @staticmethod
                def backward(ctx, g):
                    (dcs,) = ctx.vjp(jnp.asarray(_to_np(g)))
                    return tuple(torch.from_numpy(np.conj(np.array(c)))
                                 for c in dcs)

            class _Hpf(torch.autograd.Function):
                @staticmethod
                def forward(ctx, x):
                    y, vjp = jax.vjp(cqt.apply_hpf_DC, jnp.asarray(_to_np(x)))
                    ctx.vjp = vjp
                    return torch.from_numpy(np.array(y))

                @staticmethod
                def backward(ctx, g):
                    (dx,) = ctx.vjp(jnp.asarray(_to_np(g)))
                    return torch.from_numpy(np.array(dx))

            self._fwd, self._bwd, self._hpf = _Fwd, _Bwd, _Hpf

        def fwd(self, x):
            return list(self._fwd.apply(x))

        def bwd(self, coeffs):
            return self._bwd.apply(*coeffs)

        def apply_hpf_DC(self, x):
            return self._hpf.apply(x)

    fake = types.ModuleType("cqt_nsgt_pytorch")
    fake.CQT_nsgt = CQT_nsgt
    sys.modules["cqt_nsgt_pytorch"] = fake
    sys.modules.setdefault("torchaudio", types.ModuleType("torchaudio"))


def _load_reference_module():
    _install_shims()
    import importlib.util
    spec = importlib.util.spec_from_file_location("ref_unet_adaln2", REF_NET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _args(attention_layers, use_rel_pos=False):
    from aid_tpu.utils.containers import EasyDict
    return EasyDict({
        "exp": {"sample_rate": TINY["fs"], "audio_len": TINY["audio_len"]},
        "network": {
            "emb_dim": 32,
            "use_norm": True,
            "use_fencoding": False,
            "Ns": [8, 16, 16],
            "Ss": [2, 2, 2],
            "num_dils": [1, 2, 2],
            "attention_layers": list(attention_layers),
            "bottleneck_type": "res_dil_convs",
            "num_bottleneck_layers": 1,
            "cqt": {"window": "kaiser", "beta": 1,
                    "num_octs": TINY["num_octs"],
                    "bins_per_oct": TINY["bins_per_oct"]},
            "attention_dict": {"num_heads": 2, "attn_dropout": 0.0,
                               "bias_qkv": False, "N": 0,
                               "rel_pos_num_buckets": 8,
                               "rel_pos_max_distance": 16,
                               "use_rel_pos": use_rel_pos, "Nproj": 2},
        },
    })


@pytest.mark.parametrize("attention_layers,use_rel_pos", [
    ((0, 1, 1, 1), False),
    ((0, 0, 1, 1), True),
])
def test_forward_parity_vs_reference_code(attention_layers, use_rel_pos):
    import jax
    import jax.numpy as jnp
    import torch

    from aid_tpu.models.unet_cqt import UnetCQT
    from aid_tpu.ops.cqt import get_cqt
    from aid_tpu.utils.checkpoint_torch import convert_state_dict

    args = _args(attention_layers, use_rel_pos)
    mod = _load_reference_module()
    torch.manual_seed(0)
    ref = mod.Unet_CQT_oct_with_attention(args, device="cpu").eval()

    rng = np.random.default_rng(7)
    x = (rng.standard_normal((2, TINY["audio_len"])) * 0.1).astype(np.float32)
    cnoise = np.full((2, 1), 0.25 * math.log(0.3), np.float32)

    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x), torch.from_numpy(cnoise)).numpy()

    model = UnetCQT(
        cqt=get_cqt(**TINY, window=("kaiser", 1.0)),  # match the ref args
        Ns=tuple(args.network.Ns),
        num_dils=tuple(args.network.num_dils),
        attention_layers=tuple(attention_layers),
        attention=dict(args.network.attention_dict),
        emb_dim=args.network.emb_dim,
        use_norm=True, use_fencoding=False,
    )
    params0 = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x),
                                  jnp.asarray(cnoise))
    params = convert_state_dict(
        {k: v for k, v in ref.state_dict().items()}, params0)

    old = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", "highest")
        y = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x),
                                            jnp.asarray(cnoise)))
    finally:
        jax.config.update("jax_default_matmul_precision", old)

    scale = float(np.max(np.abs(y_ref))) + 1e-12
    rel = float(np.max(np.abs(y - y_ref))) / scale
    assert rel < 5e-4, f"max rel diff vs reference code: {rel:.2e}"


def _tiny_overrides(tmp):
    return [
        "exp=test_cqtdiff_22k", "exp.audio_len=2048", "exp.sample_rate=4096",
        "network.cqt.num_octs=3", "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,16]", "network.num_dils=[1,2,2]",
        "network.attention_layers=[0,0,1,1]",
        "network.attention_dict.num_heads=2", "network.attention_dict.Nproj=2",
        "network.compute_dtype=float32",
        "network.conv_foldf=False", "network.conv_pack_stack=False",
        "network.conv_chain_regroup=False", "network.gelu=erf",
        "network.Ss=[2,2,2]",                       # read (unused) by the ref ctor
        "network.attention_dict.N=0",               # idem
        "tester.T=4", "tester.order=2",
        "tester.diff_params.same_as_training=True",
        "diff_params.Schurn=0",                     # deterministic trajectories
        "tester.data_consistency.hann_size=4",
        "logging.print_model_summary=False", f"model_dir={tmp}",
    ]


def _build_both(tmp, extra=(), sampler_file="edm_sampler_inpainting.py"):
    """(reference Sampler, our Sampler, shared composed args) with identical
    weights and a shared fixed prior. ``sampler_file`` picks which genuine
    reference sampler to load (the inpainting one or the generic
    edm_sampler.py used by the BWE/declipping/phase-retrieval family)."""
    import jax
    import jax.numpy as jnp
    import torch

    from aid_tpu import setup as asetup
    from aid_tpu.utils.checkpoint_torch import convert_state_dict
    from aid_tpu.utils.config import compose

    args = compose(overrides=_tiny_overrides(tmp) + list(extra))
    if sampler_file == "edm_sampler.py":
        # the generic sampler reads a flat boolean here (edm_sampler.py:21)
        # where the inpainting config tree has a {use, type} sub-dict
        args["tester"]["posterior_sampling"]["data_consistency"] = False
    mod = _load_reference_module()
    torch.manual_seed(0)
    ref_net = mod.Unet_CQT_oct_with_attention(args, device="cpu").eval()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_edm", "/root/reference/diff_params/edm.py")
    # reference edm.py does `import utils.training_utils as utils` — give it
    # the real reference package path
    sys.path.insert(0, "/root/reference")
    try:
        ref_edm_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_edm_mod)
    finally:
        sys.path.remove("/root/reference")
    ref_diff = ref_edm_mod.EDM(args)

    spec2 = importlib.util.spec_from_file_location(
        "ref_sampler", f"/root/reference/testing/{sampler_file}")
    ref_samp_mod = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(ref_samp_mod)
    ref_sampler = ref_samp_mod.Sampler(ref_net, ref_diff, args, rid=False)

    bundle = asetup.setup_network(args)
    bundle.init(jax.random.PRNGKey(0), 1, int(args.exp.audio_len))
    bundle.params = convert_state_dict(dict(ref_net.state_dict()),
                                       bundle.params)
    ours = asetup.setup_sampler(
        args, network=bundle,
        diff_params=asetup.setup_diff_parameters(args))
    return ref_sampler, ours, args


def test_training_gradient_parity_vs_reference_code(monkeypatch):
    """d(loss)/d(params) for the FULL training loss, reference torch code vs
    this repo, with pinned sigma/noise and converter-mapped weights. The
    torch gradients are mapped through the same converter as the weights
    (it is a pure reshape/transpose map, so cotangents transform
    identically) and compared leaf-for-leaf — the strongest offline check
    that TRAINING (not just inference) matches: BiasFreeGroupNorm's ddof=1
    std backward, adaLN gates, attention, resamplers, pyramid path, and the
    CQT adjoint all in play."""
    import jax
    import jax.numpy as jnp
    import torch

    from aid_tpu.diffusion import edm as our_edm
    from aid_tpu.models.unet_cqt import UnetCQT
    from aid_tpu.ops.cqt import get_cqt
    from aid_tpu.utils.checkpoint_torch import convert_state_dict

    args = _args((0, 0, 1, 1), use_rel_pos=False)
    args["diff_params"] = {
        "sigma_data": 0.063, "sigma_min": 1e-5, "sigma_max": 10.0,
        "P_mean": -1.2, "P_std": 1.2,
        "ro": 13.0, "ro_train": 10.0, "Schurn": 5.0, "Snoise": 1.0,
        "Stmin": 0.0, "Stmax": 50.0,
        "aweighting": {"use_aweighting": False}}
    mod = _load_reference_module()
    torch.manual_seed(0)
    ref_net = mod.Unet_CQT_oct_with_attention(args, device="cpu").train()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_edm_g", "/root/reference/diff_params/edm.py")
    sys.path.insert(0, "/root/reference")
    try:
        ref_edm_mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref_edm_mod)
    finally:
        sys.path.remove("/root/reference")
    ref_diff = ref_edm_mod.EDM(args)

    B, L = 2, TINY["audio_len"]
    rng = np.random.default_rng(31)
    x = (rng.standard_normal((B, L)) * 0.05).astype(np.float32)
    n = rng.standard_normal((B, L)).astype(np.float32)
    sigma = np.asarray([[0.03], [0.5]], np.float32)

    ref_diff.sample_ptrain_safe = (
        lambda nb: torch.from_numpy(sigma[:, 0].copy()))
    ref_diff.sample_prior = lambda shape, s: torch.from_numpy(n) * s
    monkeypatch.setattr(our_edm, "sample_ptrain_safe",
                        lambda p, key, nb: jnp.asarray(sigma[:, 0]))
    monkeypatch.setattr(our_edm, "sample_prior",
                        lambda p, key, shape, s: jnp.asarray(n) * s)

    err2, _ = ref_diff.loss_fn(ref_net, torch.from_numpy(x))
    err2.mean().backward()
    grad_sd = {k: (v.grad if v.grad is not None else torch.zeros_like(v))
               for k, v in ref_net.named_parameters()}

    model = UnetCQT(
        cqt=get_cqt(**TINY, window=("kaiser", 1.0)),
        Ns=tuple(args.network.Ns), num_dils=tuple(args.network.num_dils),
        attention_layers=(0, 0, 1, 1),
        attention=dict(args.network.attention_dict),
        emb_dim=args.network.emb_dim, use_norm=True, use_fencoding=False)
    params0 = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(x),
        jnp.full((B, 1), 0.1, jnp.float32))
    params = convert_state_dict(dict(ref_net.state_dict()), params0)
    grads_ref = convert_state_dict(grad_sd, params0)

    p = our_edm.EDMParams.from_args(args.diff_params)

    def loss(pr):
        e2, _ = our_edm.loss_fn(
            p, lambda xx, cn: model.apply(pr, xx, cn),
            jax.random.PRNGKey(1), jnp.asarray(x))
        return jnp.mean(e2)

    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        grads = jax.grad(loss)(params)
    finally:
        jax.config.update("jax_default_matmul_precision", old)

    flat_ref = jax.tree_util.tree_leaves_with_path(grads_ref)
    flat = dict(jax.tree_util.tree_leaves_with_path(grads))
    checked = 0
    for path, g_ref in flat_ref:
        g = np.asarray(flat[path])
        g_ref = np.asarray(g_ref)
        scale = float(np.max(np.abs(g_ref)))
        if scale < 1e-12:
            assert float(np.max(np.abs(g))) < 1e-10, path  # frozen leaves
            continue
        rel = float(np.max(np.abs(g - g_ref))) / scale
        assert rel < 5e-3, f"{jax.tree_util.keystr(path)}: grad rel {rel:.2e}"
        checked += 1
    assert checked > 20  # the real parameter set, not a trivial subset


def test_exported_checkpoint_loads_via_reference_loader(tmp_path):
    """Interop in the OTHER direction: a checkpoint exported by this
    framework must load through the reference's own 7-strategy loader
    (utils/training_utils.py:214-382, the exact path its testers use on the
    released .pt files) into the reference network, and produce the same
    denoiser output as our side — a reference user can consume models
    trained here."""
    import jax
    import jax.numpy as jnp
    import torch

    from aid_tpu.models.unet_cqt import UnetCQT
    from aid_tpu.ops.cqt import get_cqt
    from aid_tpu.utils import checkpoint_torch as ckpt

    args = _args((0, 0, 1, 1), use_rel_pos=False)
    model = UnetCQT(
        cqt=get_cqt(**TINY, window=("kaiser", 1.0)),
        Ns=tuple(args.network.Ns), num_dils=tuple(args.network.num_dils),
        attention_layers=(0, 0, 1, 1),
        attention=dict(args.network.attention_dict),
        emb_dim=args.network.emb_dim, use_norm=True, use_fencoding=False)
    rng = np.random.default_rng(37)
    x = (rng.standard_normal((1, TINY["audio_len"])) * 0.1).astype(np.float32)
    cn = np.full((1, 1), 0.25 * math.log(0.3), np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(4), jnp.asarray(x),
                                 jnp.asarray(cn))

    class _B:
        pass

    b = _B()
    b.params = params
    path = str(tmp_path / "exported.pt")
    ckpt.export_checkpoint(path, b, it=123)

    mod = _load_reference_module()            # installs the CQT shim
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_tu", "/root/reference/utils/training_utils.py")
    t_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(t_utils)

    torch.manual_seed(1)
    ref_net = mod.Unet_CQT_oct_with_attention(args, device="cpu").eval()
    sd = torch.load(path, map_location="cpu", weights_only=False)
    assert sd["it"] == 123
    assert t_utils.load_state_dict(sd, ema=ref_net)

    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        y = np.asarray(jax.jit(model.apply)(params, jnp.asarray(x),
                                            jnp.asarray(cn)))
    finally:
        jax.config.update("jax_default_matmul_precision", old)
    with torch.no_grad():
        y_ref = ref_net(torch.from_numpy(x), torch.from_numpy(cn)).numpy()
    rel = np.max(np.abs(y - y_ref)) / (np.max(np.abs(y_ref)) + 1e-12)
    assert rel < 5e-4, f"reference-loaded export diverged: {rel:.2e}"


def test_cqt_shim_gradients_match_jax(tmp_path):
    """The differentiable shim's torch autograd gradients through
    bwd(fwd(x)) (both complex conversions in play) equal jax.grad of the
    same composition — guards the conjugate-Wirtinger convention bridge."""
    import jax
    import jax.numpy as jnp
    import torch

    _install_shims()
    import cqt_nsgt_pytorch as shim
    c = shim.CQT_nsgt(3, 8, mode="oct", window=["kaiser", 1.0],
                      fs=4096, audio_len=2048)
    rng = np.random.default_rng(3)
    x_np = (rng.standard_normal((1, 1, 2048)) * 0.1).astype(np.float32)
    w_np = rng.standard_normal((1, 1, 2048)).astype(np.float32)

    def loss_j(x):
        return jnp.sum(c.cqt.bwd(c.cqt.fwd(x)) * jnp.asarray(w_np) ** 2)

    g_true = np.asarray(jax.grad(loss_j)(jnp.asarray(x_np)))
    xt = torch.from_numpy(x_np.copy()).requires_grad_()
    (c.bwd(c.fwd(xt)) * torch.from_numpy(w_np) ** 2).sum().backward()
    g = xt.grad.numpy()
    rel = np.max(np.abs(g - g_true)) / (np.max(np.abs(g_true)) + 1e-12)
    assert rel < 1e-5, rel


def test_sampler_guided_trajectory_parity_vs_reference_code(
        tmp_path, monkeypatch):
    """THE headline workload, end to end against the genuine reference code:
    reconstruction-guided inpainting (xi>0 => torch.autograd.grad through the
    denoiser incl. the CQT, gradient normalization s = t*xi/(||g||/sqrt(L)),
    projection every step). Deterministic (S_churn=0), shared weights/prior."""
    import jax
    import jax.numpy as jnp
    import torch

    from aid_tpu.diffusion import edm as our_edm

    ref_sampler, ours, args = _build_both(tmp_path)
    assert float(ref_sampler.xi) > 0  # composed default must be guided
    L = int(args.exp.audio_len)
    rng = np.random.default_rng(13)
    x0 = (rng.standard_normal((1, L))).astype(np.float32)
    sigma_max = float(args.diff_params.sigma_max)
    ref_sampler.diff_params.sample_prior = (
        lambda shape, sigma: torch.from_numpy(x0 * sigma_max))
    monkeypatch.setattr(our_edm, "sample_prior",
                        lambda p, key, shape, sigma: jnp.asarray(x0) * sigma)

    clean = (0.1 * np.sin(np.linspace(0, 400, L))[None]).astype(np.float32)
    mask = np.ones((1, L), np.float32)
    mask[:, 900:1100] = 0.0
    y_masked = clean * mask

    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        r_ref = ref_sampler.predict_inpainting(
            torch.from_numpy(y_masked), torch.from_numpy(mask))
        r_ref = r_ref.detach().numpy()
        r = ours.predict_inpainting(jnp.asarray(y_masked), jnp.asarray(mask),
                                    jax.random.PRNGKey(3))
        r = np.asarray(r[0] if isinstance(r, tuple) else r)
        rel = np.max(np.abs(r - r_ref)) / (np.max(np.abs(r_ref)) + 1e-12)
        assert rel < 5e-3, f"guided trajectory diverged: {rel:.2e}"
    finally:
        jax.config.update("jax_default_matmul_precision", old)


def test_spectrogram_inpainting_trajectory_parity(tmp_path, monkeypatch):
    """STFT-domain mask inpainting (reference predict_spectrogram_inpainting
    :348-364): guided trajectories through torch.stft on the reference side
    and this repo's jax STFT must agree — window, centering, padding, and the
    replacement projector y + x - M(x) all in play."""
    import jax
    import jax.numpy as jnp
    import torch

    from aid_tpu.diffusion import edm as our_edm

    ref_sampler, ours, args = _build_both(
        tmp_path, extra=[
            "tester.spectrogram_inpainting.stft.n_fft=256",
            "tester.spectrogram_inpainting.stft.hop_length=64",
            "tester.spectrogram_inpainting.stft.win_length=256",
        ])
    L = int(args.exp.audio_len)
    rng = np.random.default_rng(17)
    x0 = (rng.standard_normal((1, L))).astype(np.float32)
    sigma_max = float(args.diff_params.sigma_max)
    ref_sampler.diff_params.sample_prior = (
        lambda shape, sigma: torch.from_numpy(x0 * sigma_max))
    monkeypatch.setattr(our_edm, "sample_prior",
                        lambda p, key, shape, sigma: jnp.asarray(x0) * sigma)

    clean = (0.1 * np.sin(np.linspace(0, 600, L))[None]).astype(np.float32)
    # rectangle in (freq, time) frames, sized off the reference's own STFT
    pad = 256 - L % 256 if L % 256 else 256
    spec = torch.stft(torch.from_numpy(np.pad(clean, ((0, 0), (0, pad)))),
                      256, 64, 256, torch.hann_window(256),
                      return_complex=True)
    F, T = spec.shape[-2], spec.shape[-1]
    mask = np.ones((F, T), np.float32)
    mask[6:20, T // 3:2 * T // 3] = 0.0

    ref_sampler.mask = torch.from_numpy(mask)
    y_masked_t = ref_sampler.apply_spectral_mask(torch.from_numpy(clean))

    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        r_ref = ref_sampler.predict_spectrogram_inpainting(
            y_masked_t, torch.from_numpy(mask)).detach().numpy()
        r = ours.predict_spectrogram_inpainting(
            jnp.asarray(y_masked_t.numpy()), jnp.asarray(mask),
            jax.random.PRNGKey(3))
        r = np.asarray(r[0] if isinstance(r, tuple) else r)
        rel = np.max(np.abs(r - r_ref)) / (np.max(np.abs(r_ref)) + 1e-12)
        assert rel < 5e-3, f"spectrogram trajectory diverged: {rel:.2e}"
    finally:
        jax.config.update("jax_default_matmul_precision", old)


def test_bwe_trajectory_parity_vs_generic_reference_sampler(
        tmp_path, monkeypatch):
    """Bandwidth extension through the GENERIC reference sampler
    (testing/edm_sampler.py predict_bwe :266-305, firwin branch): guided
    trajectories with identical FIR taps on both sides. Covers the
    edm_sampler.py guidance formula (s = xi/(normguide*t), applied to the
    score) that the BWE/declipping/phase-retrieval task family shares."""
    import jax
    import jax.numpy as jnp
    import scipy.signal
    import torch

    from aid_tpu.diffusion import edm as our_edm

    ref_sampler, ours, args = _build_both(
        tmp_path, extra=["tester.data_consistency.use=False"],
        sampler_file="edm_sampler.py")
    L = int(args.exp.audio_len)
    fs = float(args.exp.sample_rate)
    rng = np.random.default_rng(19)
    x0 = (rng.standard_normal((1, L))).astype(np.float32)
    sigma_max = float(args.diff_params.sigma_max)
    ref_sampler.diff_params.sample_prior = (
        lambda shape, sigma: torch.from_numpy(x0 * sigma_max))
    monkeypatch.setattr(our_edm, "sample_prior",
                        lambda p, key, shape, sigma: jnp.asarray(x0) * sigma)

    clean = (0.1 * np.sin(np.linspace(0, 700, L))[None]).astype(np.float32)
    order, fc = 50, fs / 8
    taps = scipy.signal.firwin(numtaps=order + 1, cutoff=fc, fs=fs,
                               window=("kaiser", 6.76)).astype(np.float32)
    y_lpf = scipy.signal.convolve(clean[0], taps, mode="same")[None]
    y_lpf = y_lpf.astype(np.float32)

    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        r_ref = ref_sampler.predict_bwe(
            torch.from_numpy(y_lpf),
            torch.from_numpy(taps).reshape(1, 1, -1), "firwin")
        r_ref = r_ref.detach().numpy()
        r = ours.predict_bwe(jnp.asarray(y_lpf), jax.random.PRNGKey(3),
                             fc=fc, fs=fs, filter_type="firwin", order=order)
        r = np.asarray(r[0] if isinstance(r, tuple) else r)
        rel = np.max(np.abs(r - r_ref)) / (np.max(np.abs(r_ref)) + 1e-12)
        assert rel < 5e-3, f"bwe trajectory diverged: {rel:.2e}"
    finally:
        jax.config.update("jax_default_matmul_precision", old)


def test_declipping_trajectory_parity_vs_generic_reference_sampler(
        tmp_path, monkeypatch):
    """Declipping (reference SamplerDeclipping, edm_sampler.py:359-384).
    The subclass itself is dead upstream — its super().__init__ passes 7
    args to a 4-arg base ctor — but its effective behavior is the base
    sampler's predict_conditional with a clip degradation, which runs fine;
    that is what we diff against."""
    import jax
    import jax.numpy as jnp
    import torch

    from aid_tpu.diffusion import edm as our_edm

    ref_sampler, ours, args = _build_both(
        tmp_path, extra=["tester.data_consistency.use=False"],
        sampler_file="edm_sampler.py")
    L = int(args.exp.audio_len)
    rng = np.random.default_rng(23)
    x0 = (rng.standard_normal((1, L))).astype(np.float32)
    sigma_max = float(args.diff_params.sigma_max)
    ref_sampler.diff_params.sample_prior = (
        lambda shape, sigma: torch.from_numpy(x0 * sigma_max))
    monkeypatch.setattr(our_edm, "sample_prior",
                        lambda p, key, shape, sigma: jnp.asarray(x0) * sigma)

    clean = (0.1 * np.sin(np.linspace(0, 800, L))[None]).astype(np.float32)
    cv = 0.04
    y_clip = np.clip(clean, -cv, cv)

    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        r_ref = ref_sampler.predict_conditional(
            torch.from_numpy(y_clip),
            lambda x: torch.clip(x, min=-cv, max=cv)).detach().numpy()
        r = ours.predict_declipping(jnp.asarray(y_clip),
                                    jax.random.PRNGKey(3), clip_value=cv)
        r = np.asarray(r[0] if isinstance(r, tuple) else r)
        rel = np.max(np.abs(r - r_ref)) / (np.max(np.abs(r_ref)) + 1e-12)
        assert rel < 5e-3, f"declipping trajectory diverged: {rel:.2e}"
    finally:
        jax.config.update("jax_default_matmul_precision", old)


def test_compsens_trajectory_parity_vs_generic_reference_sampler(
        tmp_path, monkeypatch):
    """Compressive sensing (reference SamplerCompSens, edm_sampler.py:337-357):
    a GENERIC-family task — guidance through a random sample mask with data
    consistency off (the reference ctor asserts data_consistency==False) and
    the generic guidance epsilon, so it must NOT ride the inpainting program
    (inpainting eps + projection every step)."""
    import jax
    import jax.numpy as jnp
    import torch

    from aid_tpu.diffusion import edm as our_edm

    ref_sampler, ours, args = _build_both(
        tmp_path, extra=["tester.data_consistency.use=False"],
        sampler_file="edm_sampler.py")
    L = int(args.exp.audio_len)
    rng = np.random.default_rng(29)
    x0 = (rng.standard_normal((1, L))).astype(np.float32)
    sigma_max = float(args.diff_params.sigma_max)
    ref_sampler.diff_params.sample_prior = (
        lambda shape, sigma: torch.from_numpy(x0 * sigma_max))
    monkeypatch.setattr(our_edm, "sample_prior",
                        lambda p, key, shape, sigma: jnp.asarray(x0) * sigma)

    clean = (0.1 * np.sin(np.linspace(0, 500, L))[None]).astype(np.float32)
    mask = (rng.random((1, L)) < 0.25).astype(np.float32)  # keep 25% samples
    y_sub = clean * mask

    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        r_ref = ref_sampler.predict_conditional(
            torch.from_numpy(y_sub),
            lambda x: torch.from_numpy(mask) * x).detach().numpy()
        r = ours.predict_compsens(jnp.asarray(y_sub), jnp.asarray(mask),
                                  jax.random.PRNGKey(3))
        r = np.asarray(r[0] if isinstance(r, tuple) else r)
        rel = np.max(np.abs(r - r_ref)) / (np.max(np.abs(r_ref)) + 1e-12)
        assert rel < 5e-3, f"compsens trajectory diverged: {rel:.2e}"
    finally:
        jax.config.update("jax_default_matmul_precision", old)


def test_autoregressive_outpainting_parity_vs_reference(
        tmp_path, monkeypatch):
    """Chained outpainting (reference SamplerAutoregressive,
    edm_sampler.py:386-418 — another dead-ctor subclass; its effective loop
    is replicated on the base sampler): segment 0 unconditional, each next
    segment conditioned on the trailing overlap of the previous, concat the
    non-overlap tails. xi=0 on both sides, where the reference's replacement
    step y + x_hat - m*x_hat equals our masked projector exactly (y = m*y),
    so this isolates the CHAINING logic: mask placement, context hand-off,
    and concatenation."""
    import jax
    import jax.numpy as jnp
    import torch

    from aid_tpu.diffusion import edm as our_edm

    ref_sampler, ours, args = _build_both(
        tmp_path, extra=["tester.posterior_sampling.xi=0.0",
                         "tester.data_consistency.use=False"],
        sampler_file="edm_sampler.py")
    L = int(args.exp.audio_len)
    rng = np.random.default_rng(29)
    x0 = (rng.standard_normal((1, L))).astype(np.float32)
    ref_sampler.diff_params.sample_prior = (
        lambda shape, sigma: torch.from_numpy(x0) * float(sigma))
    monkeypatch.setattr(our_edm, "sample_prior",
                        lambda p, key, shape, sigma: jnp.asarray(x0) * sigma)

    N, ov = 3, 0.25
    n_ov = int(ov * L)

    # reference AR loop (SamplerAutoregressive.predict_autoregressive body)
    with torch.no_grad():
        mask = torch.ones((1, L))
        mask[:, n_ov:] = 0
        x = ref_sampler.predict_unconditional((1, L), "cpu")
        xcat = x
        x_masked = torch.zeros((1, L))
        for _ in range(N - 1):
            x_masked[:, 0:n_ov] = x[:, -n_ov:]
            ref_sampler.mask = mask
            x = ref_sampler.predict_conditional(
                x_masked * mask, lambda z: mask * z)
            xcat = torch.cat((xcat, x[..., n_ov:]), -1)
    r_ref = xcat.numpy()

    r = ours.predict_autoregressive(jax.random.PRNGKey(3), num_segments=N,
                                    overlap=ov, shape=(1, L))
    rel = np.max(np.abs(r - r_ref)) / (np.max(np.abs(r_ref)) + 1e-12)
    assert r.shape == r_ref.shape
    assert rel < 5e-3, f"autoregressive chain diverged: {rel:.2e}"


def test_sampler_trajectory_parity_vs_reference_code(tmp_path, monkeypatch):
    """Full deterministic Heun trajectories (order 2, S_churn=0) agree with
    the genuine reference sampler: unconditional, and inpainting with the
    replacement method (xi=0) + smoothed data consistency."""
    import jax
    import jax.numpy as jnp
    import torch

    from aid_tpu.diffusion import edm as our_edm

    ref_sampler, ours, args = _build_both(tmp_path)
    L = int(args.exp.audio_len)
    rng = np.random.default_rng(11)
    x0 = (rng.standard_normal((1, L))).astype(np.float32)
    sigma_max = float(args.diff_params.sigma_max)

    # identical prior on both sides
    ref_sampler.diff_params.sample_prior = (
        lambda shape, sigma: torch.from_numpy(x0 * sigma_max))
    monkeypatch.setattr(our_edm, "sample_prior",
                        lambda p, key, shape, sigma: jnp.asarray(x0) * sigma)

    old = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        # --- unconditional ---
        with torch.no_grad():
            y_ref = ref_sampler.predict_unconditional((1, L), "cpu").numpy()
        y = np.asarray(ours.predict_unconditional((1, L),
                                                  jax.random.PRNGKey(3)))
        rel = np.max(np.abs(y - y_ref)) / (np.max(np.abs(y_ref)) + 1e-12)
        assert rel < 2e-3, f"unconditional trajectory diverged: {rel:.2e}"

        # --- inpainting, replacement method (xi=0) ---
        ref_sampler.xi = 0.0
        args["tester"]["posterior_sampling"]["xi"] = 0.0
        from aid_tpu import setup as asetup
        ours2 = asetup.setup_sampler(
            args, network=ours.model,
            diff_params=asetup.setup_diff_parameters(args))
        clean = (0.1 * np.sin(np.linspace(0, 500, L))[None]).astype(np.float32)
        mask = np.ones((1, L), np.float32)
        mask[:, 800:1000] = 0.0
        y_masked = clean * mask
        with torch.no_grad():
            r_ref = ref_sampler.predict_inpainting(
                torch.from_numpy(y_masked), torch.from_numpy(mask)).numpy()
        r = ours2.predict_inpainting(jnp.asarray(y_masked), jnp.asarray(mask),
                                     jax.random.PRNGKey(3))
        r = np.asarray(r[0] if isinstance(r, tuple) else r)
        rel = np.max(np.abs(r - r_ref)) / (np.max(np.abs(r_ref)) + 1e-12)
        assert rel < 2e-3, f"inpainting trajectory diverged: {rel:.2e}"
    finally:
        jax.config.update("jax_default_matmul_precision", old)
