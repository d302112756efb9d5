"""Fused adaLN dilated-conv megakernel vs the unfused XLA composition.

The kernel (aid_tpu/ops/pallas/conv_block.py) must match
    out = (h + conv2d_same(gelu(h*mult), W, dil=(d,1)) * gate) / sqrt(2)
and its VJP w.r.t. every input, including the regrouped d>=8 path and the
edge-handling of the haloed window loads (tests pick shapes where blocks hit
all 3x3 boundary cases). Runs in Pallas interpret mode on the CPU mesh.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.ops.pallas.conv_block import fused_adaln_conv_layer


def _ref(h, mult, gate, w, d):
    g = jax.nn.gelu(h * mult[:, None, None, :], approximate=False)
    y = jax.lax.conv_general_dilated(
        g, w, (1, 1), "SAME", rhs_dilation=(d, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (h + y * gate[:, None, None, :]) / math.sqrt(2.0)


def _inputs(B, F, T, C, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    h = jax.random.normal(ks[0], (B, F, T, C), jnp.float32)
    mult = jax.random.normal(ks[1], (B, C)) * 0.5 + 1.0
    gate = jax.random.normal(ks[2], (B, C)) * 0.3
    w = jax.random.normal(ks[3], (5, 3, C, C)) * 0.2
    return h, mult, gate, w


@pytest.mark.parametrize("B,F,T,C,d", [
    (2, 8, 32, 8, 1),     # B>1, window T-halo out of range both sides
    (1, 16, 64, 8, 2),    # multi T-tile candidate
    (2, 12, 32, 8, 4),    # F not a multiple of the halo
    (1, 16, 32, 8, 8),    # regrouped path
    (1, 64, 48, 8, 16),   # regrouped, odd T multiple
])
def test_forward_matches_xla(B, F, T, C, d):
    h, mult, gate, w = _inputs(B, F, T, C)
    a = fused_adaln_conv_layer(h, mult, gate, w, d)
    b = _ref(h, mult, gate, w, d)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-6, rtol=1e-5)


@pytest.mark.parametrize("B,F,T,C,d", [(2, 8, 32, 8, 1), (1, 16, 32, 8, 8)])
def test_vjp_matches_xla(B, F, T, C, d):
    """All four cotangents: dh/dmult via the Pallas bwd kernel, dgate/dW via
    the XLA branch of the custom VJP."""
    h, mult, gate, w = _inputs(B, F, T, C, seed=1)

    def loss_fused(*args):
        return jnp.sum(jnp.sin(fused_adaln_conv_layer(*args, d)))

    def loss_ref(*args):
        return jnp.sum(jnp.sin(_ref(*args, d)))

    ga = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(h, mult, gate, w)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(h, mult, gate, w)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2e-4, rtol=1e-3)


def test_model_path_checkpoint_compatible():
    """UnetCQT with use_conv_megakernel=True consumes the SAME params as the
    plain path and produces the same output/input-gradient (tiny config)."""
    import copy

    from aid_tpu import setup as asetup
    from aid_tpu.utils.config import compose

    overrides = ["logging.print_model_summary=False", "model_dir=/tmp/aid_mk",
                 "network.Ns=[8,8]", "network.num_dils=[2,2]",
                 "network.attention_layers=[0,0,0]", "network.cqt.num_octs=2",
                 "network.cqt.bins_per_oct=8", "network.emb_dim=16",
                 "exp.audio_len=2048", "network.compute_dtype=float32"]
    args = compose(overrides=overrides)
    plain = asetup.setup_network(args)
    plain.init(jax.random.PRNGKey(0), 1, 2048)
    args2 = copy.deepcopy(args)
    args2.network["use_conv_megakernel"] = True
    fused = asetup.setup_network(args2)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 2048)),
                    jnp.float32)
    cn = jnp.full((1, 1), -0.5, jnp.float32)
    y1 = plain.module.apply(plain.params, x, cn)
    y2 = fused.module.apply(plain.params, x, cn)   # plain params on purpose
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    g1 = jax.grad(lambda a: jnp.sum(plain.module.apply(plain.params, a, cn) ** 2))(x)
    g2 = jax.grad(lambda a: jnp.sum(fused.module.apply(plain.params, a, cn) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4, rtol=1e-3)
