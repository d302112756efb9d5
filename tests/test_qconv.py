"""int8 quantized conv/dot (aid_tpu/ops/qconv.py): exactness on
integer-representable inputs, approximation bounds on realistic ones, the
custom-VJP backward identity, model-level fidelity, and the trainer guard."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aid_tpu.ops.qconv import qconv, qdot


def _int_tensor(rng, shape):
    """Integer-valued f32 tensor with per-ROW max-abs exactly 127, so the
    per-sample activation scales are exactly 1 (quantization-exact)."""
    x = rng.integers(-127, 128, shape).astype(np.float32)
    x.reshape(shape[0], -1)[:, 0] = 127.0
    return jnp.asarray(x)


def _ref_conv(x, w, dilation):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("dilation", [(1, 1), (4, 1)])
def test_qconv_exact_on_int_inputs(dilation):
    rng = np.random.default_rng(0)
    x = _int_tensor(rng, (2, 16, 24, 8))
    w = _int_tensor(rng, (5, 3, 8, 8)) / 127.0  # per-channel max <= 1
    # force every output channel's max to be quantization-exact
    w = jnp.round(w * 127.0).at[0, 0, 0, :].set(127.0) / 127.0 * 127.0
    y = qconv(x, w, dilation)
    y_ref = _ref_conv(x, w, dilation)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=0, atol=1e-3)


def test_qconv_vjp_is_quantized_transpose_conv():
    rng = np.random.default_rng(1)
    x = _int_tensor(rng, (1, 8, 12, 4))
    w = np.array(_int_tensor(rng, (5, 3, 4, 4)))
    # pin max-abs to 127 along BOTH channel groupings so the forward's
    # per-out-channel scales AND the backward's (in/out swapped) are exact
    for c in range(4):
        w[0, 0, c, c] = 127.0
    w = jnp.asarray(w)
    g = _int_tensor(rng, (1, 8, 12, 4))
    _, vjp = jax.vjp(lambda a: qconv(a, w, (2, 1)), x)
    (dx,) = vjp(g)
    _, vjp_ref = jax.vjp(lambda a: _ref_conv(a, w, (2, 1)), x)
    (dx_ref,) = vjp_ref(g)
    # integer-exact quantization => backward must equal the f32 transpose conv
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=0, atol=1e-2)


def test_qconv_weight_cotangent_is_zero():
    rng = np.random.default_rng(2)
    x = _int_tensor(rng, (1, 8, 12, 4))
    w = _int_tensor(rng, (3, 3, 4, 4))
    g = jnp.ones((1, 8, 12, 4), jnp.float32)
    _, vjp = jax.vjp(lambda a, b: qconv(a, b, (1, 1)), x, w)
    _, dw = vjp(g)
    assert float(jnp.max(jnp.abs(dw))) == 0.0


def test_qconv_relative_error_realistic():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 32, 64, 32)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((5, 3, 32, 32)) / 32).astype(np.float32))
    y = qconv(x, w, (2, 1))
    y_ref = _ref_conv(x, w, (2, 1))
    rel = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.02, rel


def test_qdot_matches_dense_and_vjp():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 24)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((24, 48)) / 24).astype(np.float32))
    y = qdot(x, w)
    y_ref = jnp.einsum("bftc,cn->bftn", x, w)
    rel = float(jnp.linalg.norm(y - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.02, rel
    g = jnp.asarray(rng.standard_normal(y.shape).astype(np.float32))
    _, vjp = jax.vjp(lambda a: qdot(a, w), x)
    (dx,) = vjp(g)
    dx_ref = jnp.einsum("bftn,cn->bftc", g, w)
    cos = float(jnp.vdot(dx, dx_ref)
                / (jnp.linalg.norm(dx) * jnp.linalg.norm(dx_ref)))
    assert cos > 0.999, cos


def _tiny_args(tmp, quant):
    from aid_tpu.utils.config import compose
    return compose(overrides=[
        "exp=test_cqtdiff_22k", "exp.audio_len=2048", "exp.sample_rate=4096",
        "network.cqt.num_octs=3", "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,16]", "network.num_dils=[1,2,2]",
        "network.attention_layers=[0,0,0,0]",
        "network.compute_dtype=float32",
        f"network.quant={quant}",
        "logging.print_model_summary=False", f"model_dir={tmp}",
    ])


def test_model_fidelity_and_guidance_direction(tmp_path):
    """End-to-end through the tiny denoiser: int8 output stays close to f32
    and the guidance gradient (the thing the sampler backprops) keeps its
    direction — guidance normalizes by ||g||, so direction is what matters."""
    from aid_tpu import setup as asetup

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32) * 0.1)
    sig = jnp.full((1, 1), 0.05, jnp.float32)

    outs, grads = {}, {}
    for quant in ("none", "int8"):
        args = _tiny_args(tmp_path, quant)
        bundle = asetup.setup_network(args)
        bundle.init(jax.random.PRNGKey(0), 1, 2048)
        fn = lambda a: jnp.sum(bundle.apply(a, sig) ** 2)
        outs[quant] = bundle.apply(x, sig)
        grads[quant] = jax.grad(fn)(x)

    rel = float(jnp.linalg.norm(outs["int8"] - outs["none"])
                / (jnp.linalg.norm(outs["none"]) + 1e-12))
    assert rel < 0.05, f"int8 denoiser output drifted: {rel:.3f}"
    a, b = grads["int8"], grads["none"]
    cos = float(jnp.vdot(a, b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))
    assert cos > 0.99, f"guidance direction drifted: cos={cos:.4f}"


def test_int8_composes_with_stack_modes(tmp_path):
    """The flagship ships conv_pack_stack + conv_chain_regroup + conv_foldf;
    int8 must stay faithful through the folded/packed weight transforms."""
    from aid_tpu import setup as asetup
    from aid_tpu.utils.config import compose

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32) * 0.1)
    sig = jnp.full((1, 1), 0.05, jnp.float32)
    outs = {}
    for quant in ("none", "int8"):
        args = compose(overrides=[
            "exp=test_cqtdiff_22k", "exp.audio_len=2048",
            "exp.sample_rate=4096",
            "network.cqt.num_octs=3", "network.cqt.bins_per_oct=8",
            "network.Ns=[8,16,16]", "network.num_dils=[2,4,4]",
            "network.attention_layers=[0,0,0,0]",
            "network.compute_dtype=float32",
            "network.conv_pack_stack=True", "network.conv_chain_regroup=True",
            "network.conv_foldf=True", f"network.quant={quant}",
            "logging.print_model_summary=False", f"model_dir={tmp_path}",
        ])
        bundle = asetup.setup_network(args)
        bundle.init(jax.random.PRNGKey(0), 1, 2048)
        outs[quant] = bundle.apply(x, sig)
    rel = float(jnp.linalg.norm(outs["int8"] - outs["none"])
                / (jnp.linalg.norm(outs["none"]) + 1e-12))
    assert rel < 0.05, f"int8+stack-modes drifted: {rel:.3f}"


def test_guided_sampler_runs_quantized(tmp_path):
    """Full guided inpainting (value_and_grad through the quantized denoiser,
    projection every step) under int8: finite output, observed samples pinned
    by data consistency, and the restoration stays close to the f32 one."""
    import jax
    from aid_tpu import setup as asetup

    rng = np.random.default_rng(7)
    clean = (0.1 * np.sin(np.linspace(0, 500, 2048))[None]).astype(np.float32)
    mask = np.ones((1, 2048), np.float32)
    mask[:, 800:1000] = 0.0
    y = jnp.asarray(clean * mask)

    outs = {}
    for quant in ("none", "int8"):
        args = _tiny_args(tmp_path, quant)
        bundle = asetup.setup_network(args)
        bundle.init(jax.random.PRNGKey(0), 1, 2048)
        s = asetup.setup_sampler(args, network=bundle,
                                 diff_params=asetup.setup_diff_parameters(args))
        r = s.predict_inpainting(y, jnp.asarray(mask), jax.random.PRNGKey(2))
        outs[quant] = np.asarray(r[0] if isinstance(r, tuple) else r)
        assert np.isfinite(outs[quant]).all()
        # smoothed data consistency pins the deep interior of observed audio
        np.testing.assert_allclose(outs[quant][:, :700], clean[:, :700],
                                   atol=1e-4)
    rel = (np.linalg.norm(outs["int8"] - outs["none"])
           / (np.linalg.norm(outs["none"]) + 1e-12))
    assert rel < 0.1, f"quantized guided restoration drifted: {rel:.3f}"


def test_trainer_refuses_quantized_network(tmp_path):
    from aid_tpu import setup as asetup

    args = _tiny_args(tmp_path, "int8")
    with pytest.raises(ValueError, match="serving-only"):
        asetup.setup_trainer(args, dset=None,
                             network=asetup.setup_network(args),
                             diff_params=asetup.setup_diff_parameters(args))


# ------------------------------------------------------- load-time prequant

def test_prequant_conv_bitwise_matches_dynamic():
    """QWeight path must be bit-identical to the dynamic path: prequantize
    quantizes the SAME casted kernel on the SAME grid, just once."""
    from aid_tpu.ops.qconv import prequantize_kernel

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((2, 16, 24, 96)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((5, 3, 96, 96)) / 96)
                    .astype(np.float32))
    qw = prequantize_kernel(w, jnp.float32)
    for dil in [(1, 1), (4, 1)]:
        y_dyn = qconv(x, w, dil)
        y_pre = qconv(x, qw, dil)
        np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_pre))
        g = jnp.asarray(rng.standard_normal(y_dyn.shape).astype(np.float32))
        (dx_dyn,) = jax.vjp(lambda a: qconv(a, w, dil), x)[1](g)
        (dx_pre,) = jax.vjp(lambda a: qconv(a, qw, dil), x)[1](g)
        np.testing.assert_array_equal(np.asarray(dx_dyn), np.asarray(dx_pre))


def test_prequant_dot_bitwise_matches_dynamic():
    from aid_tpu.ops.qconv import prequantize_kernel

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 24)).astype(np.float32))
    w4 = jnp.asarray((rng.standard_normal((1, 1, 24, 48)) / 24)
                     .astype(np.float32))
    qw = prequantize_kernel(w4, jnp.float32)
    y_dyn = qdot(x, w4[0, 0])
    y_pre = qdot(x, qw)
    np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_pre))
    g = jnp.asarray(rng.standard_normal(y_dyn.shape).astype(np.float32))
    (dx_dyn,) = jax.vjp(lambda a: qdot(a, w4[0, 0]), x)[1](g)
    (dx_pre,) = jax.vjp(lambda a: qdot(a, qw), x)[1](g)
    np.testing.assert_array_equal(np.asarray(dx_dyn), np.asarray(dx_pre))


def test_prequantize_params_eligibility():
    """1x1 kernels and wide spatial kernels become QWeight; the C<=64
    spatial kernels (foldf/pack levels need the raw kernel) stay dense;
    non-kernel leaves untouched."""
    from aid_tpu.ops.qconv import QWeight, prequantize_params

    params = {"params": {
        "proj": {"kernel": jnp.ones((1, 1, 8, 16))},
        "wide": {"kernel": jnp.ones((5, 3, 96, 96))},
        "narrow": {"kernel": jnp.ones((5, 3, 64, 64))},
        "affine": {"kernel": jnp.ones((256, 16)), "bias": jnp.zeros((16,))},
    }}
    out = prequantize_params(params, jnp.float32)
    p = out["params"]
    assert isinstance(p["proj"]["kernel"], QWeight)
    assert isinstance(p["wide"]["kernel"], QWeight)
    assert not isinstance(p["narrow"]["kernel"], QWeight)
    assert not isinstance(p["affine"]["kernel"], QWeight)
    assert p["affine"]["bias"].shape == (16,)


def test_model_apply_with_prequant_params_matches_dynamic(tmp_path):
    """Full tiny denoiser: apply(prequantized params) must equal the dynamic
    int8 apply bit for bit (same grids), and gradients too."""
    from aid_tpu import setup as asetup
    from aid_tpu.ops.qconv import QWeight, prequantize_params

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((1, 2048)).astype(np.float32) * 0.1)
    sig = jnp.full((1, 1), 0.05, jnp.float32)
    args = _tiny_args(tmp_path, "int8")
    bundle = asetup.setup_network(args)
    bundle.init(jax.random.PRNGKey(0), 1, 2048)
    pq = prequantize_params(bundle.params, jnp.float32)
    n_q = sum(isinstance(l, QWeight) for l in
              jax.tree_util.tree_leaves(
                  pq, is_leaf=lambda l: isinstance(l, QWeight)))
    assert n_q > 0, "no kernels were prequantized on the tiny model"
    y_dyn = bundle.apply(x, sig)
    y_pre = bundle.module.apply(pq, x, sig)
    np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_pre))
    g_dyn = jax.grad(lambda a: jnp.sum(bundle.module.apply(
        bundle.params, a, sig) ** 2))(x)
    g_pre = jax.grad(lambda a: jnp.sum(bundle.module.apply(pq, a, sig) ** 2))(x)
    np.testing.assert_array_equal(np.asarray(g_dyn), np.asarray(g_pre))


def test_sampler_prequantizes_once(tmp_path):
    """Sampler._sparams: int8 -> QWeight leaves, cached per params object;
    quant=none -> the original tree, untouched."""
    from aid_tpu import setup as asetup
    from aid_tpu.ops.qconv import QWeight

    args = _tiny_args(tmp_path, "int8")
    bundle = asetup.setup_network(args)
    bundle.init(jax.random.PRNGKey(0), 1, 2048)
    s = asetup.setup_sampler(args, network=bundle,
                             diff_params=asetup.setup_diff_parameters(args))
    sp = s._sparams()
    leaves = jax.tree_util.tree_leaves(
        sp, is_leaf=lambda l: isinstance(l, QWeight))
    assert any(isinstance(l, QWeight) for l in leaves)
    assert s._sparams() is sp                      # cached
    bundle.init(jax.random.PRNGKey(1), 1, 2048)    # checkpoint reload
    assert s._sparams() is not sp                  # cache invalidated

    args0 = _tiny_args(tmp_path, "none")
    b0 = asetup.setup_network(args0)
    b0.init(jax.random.PRNGKey(0), 1, 2048)
    s0 = asetup.setup_sampler(args0, network=b0,
                              diff_params=asetup.setup_diff_parameters(args0))
    assert s0._sparams() is b0.params
