"""Pallas fused-kernel tests (CPU interpreter): numerical equality with the
unfused composition, forward and gradients, and inside the full U-Net."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu.ops.pallas.fused_adaln import group_std, norm_adaln_gelu


def _unfused(x, gamma, aff, eps=1e-7, G=8):
    B, F, T, C = x.shape
    xf = x.astype(jnp.float32).reshape(B, F, T, G, C // G)
    n = F * T * (C // G)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.sum((xf - mean) ** 2, axis=(1, 2, 4), keepdims=True) / (n - 1)
    y = (xf / (jnp.sqrt(var) + eps)).reshape(B, F, T, C) * gamma
    y = y * (aff[:, None, None, :] + 1.0)
    return jax.nn.gelu(y, approximate=False)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(16) * 0.1 + 1.0, jnp.float32)
    aff = jnp.asarray(rng.standard_normal((2, 16)) * 0.3, jnp.float32)
    return x, gamma, aff


def test_fused_matches_unfused_forward(data):
    x, gamma, aff = data
    got = norm_adaln_gelu(x, group_std(x, 8), gamma, aff, 1e-7, 8)
    ref = _unfused(x, gamma, aff)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_matches_unfused_grads(data):
    x, gamma, aff = data

    def loss_fused(x, gamma, aff):
        return jnp.sum(norm_adaln_gelu(x, group_std(x, 8), gamma, aff,
                                       1e-7, 8) ** 2)

    def loss_ref(x, gamma, aff):
        return jnp.sum(_unfused(x, gamma, aff) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, aff)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, aff)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


def test_unet_with_pallas_flag_matches(data):
    from aid_tpu.models.unet_cqt import UnetCQT
    from aid_tpu.ops.cqt import get_cqt
    cqt = get_cqt(3, 8, 4096.0, 2048)
    kw = dict(cqt=cqt, Ns=(8, 16, 16), num_dils=(1, 2, 2),
              attention_layers=(0, 0, 0, 0), attention={}, emb_dim=32)
    m0 = UnetCQT(use_pallas=False, **kw)
    m1 = UnetCQT(use_pallas=True, **kw)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 2048)),
                    jnp.float32)
    cn = jnp.full((2, 1), -0.3)
    p = jax.jit(m0.init)(jax.random.PRNGKey(0), x, cn)
    y0 = jax.jit(m0.apply)(p, x, cn)
    y1 = jax.jit(m1.apply)(p, x, cn)   # same params (identical tree)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=5e-5, rtol=5e-5)
