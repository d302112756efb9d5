"""Function-level differential parity of the EDM parameterization, the
A-weighting loss filter, and the optimizer against the GENUINE reference code
(/root/reference/diff_params/edm.py, utils/training_utils.py FIRFilter, and
torch.optim.Adam as constructed by utils/setup.py:55-58). Complements the
trajectory-level diffs in test_reference_code_parity.py with deterministic
per-function checks. Skipped when the reference checkout is absent."""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference checkout not available")


def _load_ref_module(rel):
    sys.modules.setdefault("torchaudio", types.ModuleType("torchaudio"))
    spec = importlib.util.spec_from_file_location(
        rel.replace("/", "_").replace(".py", ""), os.path.join(REF, rel))
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, REF)
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF)
    return mod


def _edm_args():
    from aid_tpu.utils.containers import EasyDict
    return EasyDict({"diff_params": {
        "sigma_data": 0.063, "sigma_min": 1e-5, "sigma_max": 10.0,
        "P_mean": -1.2, "P_std": 1.2, "ro": 13.0, "ro_train": 10.0,
        "Schurn": 5.0, "Snoise": 1.0, "Stmin": 0.0, "Stmax": 50.0,
        "aweighting": {"use_aweighting": False}},
        "exp": {"sample_rate": 22050, "audio_len": 2048}})


def test_edm_schedule_gamma_precond_match_reference():
    import jax.numpy as jnp
    import torch

    from aid_tpu.diffusion import edm as ours

    args = _edm_args()
    ref = _load_ref_module("diff_params/edm.py").EDM(args)
    p = ours.EDMParams.from_args(args.diff_params)

    for T in (5, 35, 70):
        t_ref = ref.create_schedule(T).numpy()
        t = np.asarray(ours.create_schedule(p, T))
        np.testing.assert_allclose(t, t_ref, rtol=1e-6, atol=1e-12)

        g_ref = ref.get_gamma(torch.from_numpy(t_ref)).numpy()
        g = np.asarray(ours.get_gamma(p, jnp.asarray(t)))
        np.testing.assert_allclose(g, g_ref, rtol=1e-6, atol=1e-12)

    sig = np.logspace(-5, 1, 13).astype(np.float32).reshape(-1, 1)
    st = torch.from_numpy(sig)
    sj = jnp.asarray(sig)
    np.testing.assert_allclose(np.asarray(ours.cskip(p, sj)),
                               ref.cskip(st).numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.cout(p, sj)),
                               ref.cout(st).numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.cin(p, sj)),
                               ref.cin(st).numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.cnoise(p, sj)),
                               ref.cnoise(st).numpy(), rtol=1e-6)


def test_edm_denoiser_and_train_preconditioning_match_reference():
    """denoiser() and prepare_train_preconditioning() with a shared fake net
    and fixed noise (the stochastic sigma draw is pinned by feeding the same
    sigma to both sides)."""
    import jax.numpy as jnp
    import torch

    from aid_tpu.diffusion import edm as ours

    args = _edm_args()
    ref = _load_ref_module("diff_params/edm.py").EDM(args)
    p = ours.EDMParams.from_args(args.diff_params)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 256)).astype(np.float32) * 0.1
    n = rng.standard_normal((2, 256)).astype(np.float32)
    sigma = np.asarray([[0.05], [0.7]], np.float32)

    class FakeNet(torch.nn.Module):
        def forward(self, xin, cnoise):
            return 0.5 * xin + 0.01 * cnoise

    y_ref = ref.denoiser(torch.from_numpy(x + n * sigma), FakeNet(),
                         torch.from_numpy(sigma)).numpy()
    y = np.asarray(ours.denoiser(
        p, lambda xx, cn: 0.5 * xx + 0.01 * cn,
        jnp.asarray(x + n * sigma), jnp.asarray(sigma)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-7)

    # pin the internally drawn noise on both sides
    ref.sample_prior = lambda shape, s: torch.from_numpy(n)
    import jax

    orig = ours.sample_prior
    try:
        ours.sample_prior = lambda pp, key, shape, s: jnp.asarray(n)
        in_ref, target_ref, cn_ref = ref.prepare_train_preconditioning(
            torch.from_numpy(x), torch.from_numpy(sigma))
        in_o, target_o, cn_o = ours.prepare_train_preconditioning(
            p, jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(sigma))
    finally:
        ours.sample_prior = orig
    np.testing.assert_allclose(np.asarray(in_o), in_ref.numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(cn_o), cn_ref.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(target_o), target_ref.numpy(),
                               rtol=1e-4, atol=1e-6)


def test_a_weighting_filter_matches_reference():
    import jax.numpy as jnp
    import torch

    from aid_tpu.training.utils import a_weighting_filter

    tu = _load_ref_module("utils/training_utils.py")
    fs = 22050
    ref_fir = tu.FIRFilter(filter_type="aw", fs=fs, ntaps=101)
    rng = np.random.default_rng(1)
    e = rng.standard_normal((3, 512)).astype(np.float32)
    y_ref = ref_fir(torch.from_numpy(e)).numpy()
    y = np.asarray(a_weighting_filter(fs)(jnp.asarray(e)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-6)


def test_adam_step_matches_torch_reference_config():
    """The reference optimizer is torch.optim.Adam(lr) with default betas/eps
    (utils/setup.py:55-58). Five steps on identical gradients must produce
    identical parameters through our optax chain (grad clip off, constant lr
    to isolate Adam)."""
    import jax.numpy as jnp
    import optax
    import torch

    from aid_tpu.training.trainer import make_optimizer
    from aid_tpu.utils.containers import EasyDict

    rng = np.random.default_rng(2)
    w0 = rng.standard_normal(16).astype(np.float32)
    grads = [rng.standard_normal(16).astype(np.float32) for _ in range(5)]

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=2e-4)
    for it, g in enumerate(grads):
        # the reference applies its LR ramp every step (trainer.py:271-274):
        # lr * min(it / max(rampup, 1e-8), 1) — with rampup=0 that zeroes
        # step 0 and is full-lr from step 1, exactly like our schedule
        for grp in opt.param_groups:
            grp["lr"] = 2e-4 * min(it / 1e-8, 1.0)
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    exp = EasyDict({"lr": 2e-4, "lr_rampup_it": 0, "max_grad_norm": 1.0,
                    "use_grad_clip": False,
                    "optimizer": {"type": "adam", "beta1": 0.9,
                                  "beta2": 0.999, "eps": 1e-8}})
    tx = make_optimizer(exp)
    w = jnp.asarray(w0)
    state = tx.init(w)
    for i, g in enumerate(grads):
        upd, state = tx.update(jnp.asarray(g), state, w)
        w = optax.apply_updates(w, upd)
    np.testing.assert_allclose(np.asarray(w), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-7)
