"""U-Net backbone tests: shapes, jit, grads, adaLN conditioning, FIR resampler.

The FIR up/down resampler is additionally cross-checked against torch's
conv1d/conv_transpose1d recipe (the op semantics the reference relies on,
networks:549-580) — torch (CPU) is available in the image.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.ops.cqt import get_cqt
from aid_tpu.models.unet_cqt import UnetCQT, resample_time, _FIR_KERNELS

TINY = dict(num_octs=3, bins_per_oct=8, fs=4096.0, audio_len=2048)


@pytest.fixture(scope="module")
def model_and_params():
    cqt = get_cqt(**TINY)
    model = UnetCQT(
        cqt=cqt, Ns=(8, 16, 16), num_dils=(1, 2, 2),
        attention_layers=(0, 1, 1, 1),
        attention=dict(num_heads=2, bias_qkv=False, use_rel_pos=False),
        emb_dim=32, use_norm=True, use_fencoding=False,
    )
    x = jnp.zeros((2, TINY["audio_len"]))
    cn = jnp.zeros((2, 1))
    # jit the init: one compiled program instead of hundreds of per-param
    # threefry dispatches (this box has one CPU core).
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, cn)
    return model, params, jax.jit(model.apply)


def test_forward_shape_and_finite(model_and_params):
    _, params, japply = model_and_params
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, TINY["audio_len"])),
                    jnp.float32)
    cn = jnp.full((2, 1), 0.25 * math.log(0.1))
    y = japply(params, x, cn)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_jit_and_determinism(model_and_params):
    _, params, japply = model_and_params
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, TINY["audio_len"])),
                    jnp.float32)
    cn = jnp.zeros((2, 1))
    y1, y2 = japply(params, x, cn), japply(params, x, cn)
    assert jnp.array_equal(y1, y2)


def test_sigma_conditioning_changes_output(model_and_params):
    _, params, japply = model_and_params
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, TINY["audio_len"])),
                    jnp.float32)
    y1 = japply(params, x, jnp.full((2, 1), -2.0))
    y2 = japply(params, x, jnp.full((2, 1), 1.0))
    # at init the adaLN gates are 1e-7-scaled, so the effect is small but
    # must be nonzero (the conditioning path is wired through every block)
    assert float(jnp.max(jnp.abs(y1 - y2))) > 1e-10


def test_gradients_flow_to_all_params(model_and_params):
    model, params, _ = model_and_params
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, TINY["audio_len"])),
                    jnp.float32)
    cn = jnp.zeros((2, 1))

    def loss(p):
        return jnp.mean(model.apply(p, x, cn) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    flat = jax.tree_util.tree_leaves_with_path(g)
    zero_grads = [jax.tree_util.keystr(k) for k, v in flat
                  if float(jnp.max(jnp.abs(v))) == 0.0]
    # Only the frozen RFF frequencies (stop_gradient) may have zero grads; the
    # zero-init gates still receive gradients because their outputs are used.
    for name in zero_grads:
        assert "rff_freq" in name, f"unexpected zero grad at {name}"


def test_resample_down_then_up_shapes():
    x = jnp.asarray(np.random.default_rng(4).standard_normal((2, 8, 64, 3)), jnp.float32)
    d = resample_time(x, up=False)
    assert d.shape == (2, 8, 32, 3)
    u = resample_time(d, up=True)
    assert u.shape == (2, 8, 64, 3)


@pytest.mark.parametrize("kernel", ["linear", "cubic", "lanczos3"])
def test_resample_matches_torch_semantics(kernel):
    """Down/up must equal torch's reflect-pad + conv1d(stride2) / conv_transpose1d
    recipe (the semantics the reference's resampler has, networks:549-580)."""
    import torch
    import torch.nn.functional as tF

    taps = np.asarray(_FIR_KERNELS[kernel], np.float32)
    k = len(taps)
    pad = k // 2 - 1
    T = 64
    x_np = np.random.default_rng(5).standard_normal(T).astype(np.float32)

    xt = torch.from_numpy(x_np)[None, None, :]
    w = torch.from_numpy(taps)[None, None, :]
    ref_down = tF.conv1d(tF.pad(xt, (pad, pad), mode="reflect"), w, stride=2)
    ref_up = tF.conv_transpose1d(tF.pad(xt, ((pad + 1) // 2,) * 2, mode="reflect"),
                                 w, stride=2, padding=pad * 2 + 1)

    xj = jnp.asarray(x_np)[None, None, :, None]  # [B=1, F=1, T, C=1]
    got_down = np.asarray(resample_time(xj, up=False, kernel=kernel))[0, 0, :, 0]
    got_up = np.asarray(resample_time(xj, up=True, kernel=kernel))[0, 0, :, 0]

    np.testing.assert_allclose(got_down, ref_down[0, 0].numpy(), atol=1e-5)
    np.testing.assert_allclose(got_up, ref_up[0, 0].numpy(), atol=1e-5)


def test_param_count_scales_with_config():
    cqt = get_cqt(**TINY)
    small = UnetCQT(cqt=cqt, Ns=(8, 8, 8), num_dils=(1, 1, 1),
                    attention_layers=(0, 0, 0, 0), attention={}, emb_dim=16)
    x, cn = jnp.zeros((1, TINY["audio_len"])), jnp.zeros((1, 1))
    p_small = jax.jit(small.init)(jax.random.PRNGKey(0), x, cn)
    n_small = sum(v.size for v in jax.tree_util.tree_leaves(p_small))
    assert n_small > 0


@pytest.mark.parametrize("d", [2, 4, 8])
def test_dilated_conv_regrouping_matches_direct(d):
    """Conv2dFT's residue-class regrouping for freq dilation must equal the
    straightforward rhs_dilation conv."""
    from aid_tpu.models.unet_cqt import Conv2dFT
    B, F, T, C, N = 2, 16, 12, 3, 5
    x = jnp.asarray(np.random.default_rng(d).standard_normal((B, F, T, C)),
                    jnp.float32)
    m = Conv2dFT(N, (5, 3), dilation=(d, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    w = params["params"]["kernel"]
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(d, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)


def test_eight_octave_architecture():
    """The MusicNet 44k flagship shape path: 8 octaves, 9 attention slots
    (reference conf/network/paper_1912_unet_cqt_oct_attention_44k_2.yaml)."""
    cqt = get_cqt(8, 4, 16384.0, 8192)
    model = UnetCQT(
        cqt=cqt, Ns=(4, 4, 8, 8, 8, 8, 8, 8), num_dils=(1, 1, 1, 1, 1, 2, 2, 2),
        attention_layers=(0, 0, 0, 0, 0, 1, 1, 1, 1),
        attention=dict(num_heads=2), emb_dim=16,
    )
    x = jnp.zeros((1, 8192))
    cn = jnp.zeros((1, 1))
    p = jax.jit(model.init)(jax.random.PRNGKey(0), x, cn)
    y = jax.jit(model.apply)(p, x, cn)
    assert y.shape == (1, 8192)


@pytest.mark.parametrize("d", [1, 2, 4])
def test_conv_foldf_matches_direct(d):
    """Conv2dFT's freq-pair lane packing (conv_foldf, default-on in the
    flagship configs) must equal the straightforward dilated conv — the
    folded (3,3) kernel is a runtime transform of the same param."""
    from aid_tpu.models.unet_cqt import Conv2dFT
    B, F, T, C, N = 2, 16, 12, 4, 6
    x = jnp.asarray(np.random.default_rng(d).standard_normal((B, F, T, C)),
                    jnp.float32)
    m = Conv2dFT(N, (5, 3), dilation=(d, 1), foldf=True)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    w = params["params"]["kernel"]
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=(d, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)
    # gradient w.r.t. the ORIGINAL param flows through the fold
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    gref = jax.grad(lambda wv: jnp.sum(jax.lax.conv_general_dilated(
        x, wv, (1, 1), "SAME", rhs_dilation=(d, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g["params"]["kernel"]),
                               np.asarray(gref), atol=2e-4)


def test_pack_stack_matches_default():
    """conv_pack_stack (persistent pair-packed dilated stacks) is numerically
    identical to the per-layer path on C<=64 levels."""
    import numpy as np
    from aid_tpu.models.unet_cqt import AdaLNResBlock
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 24, 16)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    ref_block = AdaLNResBlock(dim_out=16, num_dils=3, use_norm=True, fdim=32)
    params = ref_block.init(jax.random.PRNGKey(0), x, emb)
    y0 = np.asarray(ref_block.apply(params, x, emb))
    packed = AdaLNResBlock(dim_out=16, num_dils=3, use_norm=True, fdim=32,
                           pack_stack=True)
    y1 = np.asarray(packed.apply(params, x, emb))
    np.testing.assert_allclose(y1, y0, atol=2e-5)
    # C > 64 levels silently keep the default path (packing would not help)
    xw = jnp.asarray(rng.standard_normal((1, 32, 24, 96)), jnp.float32)
    wide = AdaLNResBlock(dim_out=96, num_dils=2, use_norm=True, fdim=32,
                         pack_stack=True)
    pw = wide.init(jax.random.PRNGKey(1), xw, emb[:1])
    assert np.isfinite(np.asarray(wide.apply(pw, xw, emb[:1]))).all()


def test_gelu_variants_close_to_erf(model_and_params):
    """network.gelu tanh/sigmoid are serving-speed approximations of the
    reference's exact erf GELU (unet_cqt._gelu); outputs must track the erf
    model closely on realistic inputs (the approximation error is ~1e-3 at
    the activation level and stays small through the full octave U-Net)."""
    model, params, japply = model_and_params
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, TINY["audio_len"])) * 0.05,
        jnp.float32)
    cn = jnp.full((1, 1), 0.25 * math.log(0.3))
    y_erf = japply(params, x, cn)
    scale = float(jnp.max(jnp.abs(y_erf))) + 1e-9
    for variant in ("tanh", "sigmoid"):
        m2 = model.clone(gelu=variant)
        y = jax.jit(m2.apply)(params, x, cn)
        rel = float(jnp.max(jnp.abs(y - y_erf))) / scale
        assert rel < 0.05, (variant, rel)
    # and the config key plumbs through the factory
    from aid_tpu.utils.config import compose
    args = compose(overrides=["network=cqtdiff_plus_22k",
                              "logging.print_model_summary=False",
                              "model_dir=/tmp/aid_gelu_cfg"])
    from aid_tpu.models.unet_cqt import build_unet
    assert build_unet(args).gelu == "tanh"


def test_chain_regroup_matches_default():
    """conv_chain_regroup (one residue-layout transition between d>=8 layers
    instead of a regroup+ungroup pair around each) is numerically identical
    to the per-layer path. Needs num_dils >= 4 so the stack reaches d=8, and
    F divisible by the largest chained d."""
    import numpy as np
    from aid_tpu.models.unet_cqt import AdaLNResBlock
    rng = np.random.default_rng(0)
    # F=32: d=8 regroups (32%8==0), d=16 regroups (32%16==0)
    x = jnp.asarray(rng.standard_normal((2, 32, 24, 16)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    ref_block = AdaLNResBlock(dim_out=16, num_dils=5, use_norm=True, fdim=32)
    params = ref_block.init(jax.random.PRNGKey(0), x, emb)
    y0 = np.asarray(ref_block.apply(params, x, emb))
    chained = AdaLNResBlock(dim_out=16, num_dils=5, use_norm=True, fdim=32,
                            chain_regroup=True)
    y1 = np.asarray(chained.apply(params, x, emb))
    np.testing.assert_allclose(y1, y0, atol=2e-5)
    # pack_stack takes precedence at C<=64; both flags together still exact
    both = AdaLNResBlock(dim_out=16, num_dils=5, use_norm=True, fdim=32,
                         pack_stack=True, chain_regroup=True)
    y2 = np.asarray(both.apply(params, x, emb))
    np.testing.assert_allclose(y2, y0, atol=2e-5)


def test_chain_fold_matches_default(monkeypatch):
    """The folded deep-chain formulation (Fz = F/d freq rows folded into the
    lane dim, 3-tap time conv with a block-banded kernel) is numerically
    identical to the per-layer dilated path — including odd Fz (band
    clipping), a mid-stack fold -> unfold reset when F % d != 0, and the
    guidance gradient through the folded stack."""
    import numpy as np
    from aid_tpu.models.unet_cqt import AdaLNResBlock
    rng = np.random.default_rng(1)
    # F=24: d=8 folds at Fz=3 (odd band), d=16 does not divide 24 -> the
    # stack must transition folded-8 -> unfolded-1 mid-stack for layer i=4.
    x = jnp.asarray(rng.standard_normal((2, 24, 20, 16)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    ref_block = AdaLNResBlock(dim_out=16, num_dils=5, use_norm=True, fdim=24)
    params = ref_block.init(jax.random.PRNGKey(0), x, emb)
    y0 = np.asarray(ref_block.apply(params, x, emb))
    chained = AdaLNResBlock(dim_out=16, num_dils=5, use_norm=True, fdim=24,
                            chain_regroup=True)
    y1 = np.asarray(chained.apply(params, x, emb))
    np.testing.assert_allclose(y1, y0, atol=2e-5)

    # gradient (the sampler's reconstruction guidance backprops through this)
    def loss(fn):
        return lambda xx: jnp.sum(jnp.square(fn.apply(params, xx, emb)))
    g_ref = np.asarray(jax.grad(loss(ref_block))(x))
    g_chn = np.asarray(jax.grad(loss(chained))(x))
    np.testing.assert_allclose(g_chn, g_ref, atol=2e-4)

    # kill switch: AID_TPU_CHAIN_FOLD_MAX=0 falls back to the regroup path
    monkeypatch.setenv("AID_TPU_CHAIN_FOLD_MAX", "0")
    y2 = np.asarray(chained.apply(params, x, emb))
    np.testing.assert_allclose(y2, y0, atol=2e-5)


@pytest.mark.parametrize("stride", [2, 3])
def test_chain_stride_matches_default(monkeypatch, stride):
    """AID_TPU_CHAIN_STRIDE=k (hold a regrouped layout for k dilation-
    doublings, local dilated convs in between) is numerically identical to
    the per-layer transition path."""
    import numpy as np
    from aid_tpu.models.unet_cqt import AdaLNResBlock
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 24, 16)), jnp.float32)
    emb = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    ref_block = AdaLNResBlock(dim_out=16, num_dils=5, use_norm=True, fdim=32)
    params = ref_block.init(jax.random.PRNGKey(0), x, emb)
    y0 = np.asarray(ref_block.apply(params, x, emb))
    chained = AdaLNResBlock(dim_out=16, num_dils=5, use_norm=True, fdim=32,
                            chain_regroup=True)
    monkeypatch.setenv("AID_TPU_CHAIN_STRIDE", str(stride))
    y1 = np.asarray(chained.apply(params, x, emb))
    np.testing.assert_allclose(y1, y0, atol=2e-5)
    g0 = np.asarray(jax.grad(lambda xx: jnp.sum(jnp.square(
        ref_block.apply(params, xx, emb))))(x))
    g1 = np.asarray(jax.grad(lambda xx: jnp.sum(jnp.square(
        chained.apply(params, xx, emb))))(x))
    np.testing.assert_allclose(g1, g0, atol=2e-4)


@pytest.mark.parametrize("policy", ["block", "conv"])
def test_remat_policy_matches_no_remat(model_and_params, policy):
    """network.remat / remat_policy change memory, never math: forward and
    full param-gradients of the rematerialized model equal the plain one.

    The 'conv' policy stashes the checkpoint_name-tagged conv/dot outputs
    and recomputes only the elementwise chain — the training-side lever
    (bench: scripts/bench_train.py BENCH_OVERRIDES=network.remat_policy=conv).
    """
    model, params, japply = model_and_params
    rm = UnetCQT(
        cqt=model.cqt, Ns=model.Ns, num_dils=model.num_dils,
        attention_layers=model.attention_layers, attention=model.attention,
        emb_dim=model.emb_dim, use_norm=model.use_norm,
        use_fencoding=model.use_fencoding, remat=True, remat_policy=policy,
    )
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, TINY["audio_len"])),
        jnp.float32)
    cn = jnp.full((2, 1), -0.5)
    y0 = np.asarray(japply(params, x, cn))
    y1 = np.asarray(jax.jit(rm.apply)(params, x, cn))
    np.testing.assert_allclose(y1, y0, atol=1e-5)

    def loss(m):
        def f(p):
            return jnp.sum(jnp.square(m.apply(p, x, cn)))
        return jax.jit(jax.grad(f))(params)

    g0, g1 = loss(model), loss(rm)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_remat_policy_unknown_raises(model_and_params):
    model, params, _ = model_and_params
    bad = UnetCQT(
        cqt=model.cqt, Ns=model.Ns, num_dils=model.num_dils,
        attention_layers=model.attention_layers, attention=model.attention,
        emb_dim=model.emb_dim, remat=True, remat_policy="typo",
    )
    x = jnp.zeros((1, TINY["audio_len"]))
    with pytest.raises(ValueError, match="remat_policy"):
        bad.apply(params, x, jnp.zeros((1, 1)))
