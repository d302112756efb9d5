"""Full-score context parallelism on the virtual 8-device mesh.

``network.context_parallel=True`` pins every [B, F, T, C] activation's
frame-time axis to the cp mesh axis (models/unet_cqt.py _cp_constrain):
convs get halo exchanges, the FIR resamplers get boundary halos, GroupNorm
stats psum, and attention rides the ring when
``attention_dict.context_parallel`` is also on. These tests pin numerical
equality with the unsharded score (forward AND the guidance gradient — the
sampler backprops through everything) and that the partitioned program
really contains cross-device collectives (the sharding is not a silent
no-op on divisibility).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from aid_tpu import setup as asetup
from aid_tpu.parallel import mesh as pmesh
from aid_tpu.parallel.ring_attention import set_cp_mesh
from aid_tpu.utils.config import compose


def _bundle(tmp, cp: bool):
    args = compose(overrides=[
        "exp=test_cqtdiff_22k",
        "exp.audio_len=2048",
        "network.cqt.num_octs=3",
        "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,16]",
        "network.num_dils=[1,1,1]",
        "network.attention_layers=[0,0,1,1]",
        f"network.context_parallel={cp}",
        f"network.attention_dict.context_parallel={cp}",
        f"model_dir={tmp}",
    ])
    b = asetup.setup_network(args)
    b.init(jax.random.PRNGKey(0), 1, 2048)
    return b


@pytest.fixture(autouse=True)
def _clear_cp_mesh():
    yield
    set_cp_mesh(None)


def test_full_score_cp_matches_unsharded(tmp_path):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 2048)).astype(np.float32) * 0.1)
    cn = jnp.full((2, 1), 0.05, jnp.float32)

    b0 = _bundle(str(tmp_path / "ref"), False)
    y_ref = np.asarray(jax.jit(b0.module.apply)(b0.params, x, cn))

    def loss0(params, xx):
        y = b0.module.apply(params, xx, cn)
        return jnp.sum(y * y)
    g_ref = np.asarray(jax.jit(jax.grad(loss0, argnums=1))(b0.params, x))

    b1 = _bundle(str(tmp_path / "cp"), True)

    def loss1(params, xx):
        y = b1.module.apply(params, xx, cn)
        return jnp.sum(y * y)

    for n_cp in (2, 4):
        devs = np.asarray(jax.devices()[:2 * n_cp]).reshape(2, n_cp)
        set_cp_mesh(Mesh(devs, (pmesh.DATA_AXIS, "cp")))
        y = np.asarray(jax.jit(b1.module.apply)(b1.params, x, cn))
        g = np.asarray(jax.jit(jax.grad(loss1, argnums=1))(b1.params, x))
        set_cp_mesh(None)
        # measured: forward is bit-exact (halo convs keep summation order);
        # the backward differs only by f32 reduction-order noise
        np.testing.assert_allclose(y, y_ref, atol=1e-6)
        np.testing.assert_allclose(g, g_ref, atol=1e-4)


def test_dp_cp_serving_inpaint_matches_single_device(tmp_path):
    """End-to-end guided inpainting on a dp(2) x cp(4) mesh vs one device.

    Deterministic operating point (Schurn=0) for the same reason as the tp
    test: the stochastic guided trajectory is chaotic, the ODE trajectory is
    stable. ``InpaintingService.shard`` must flip the module to its
    context-parallel form (same params) and install the cp mesh, and the
    whole pipeline — score with halo convs + ring attention, VJP guidance,
    projection, window scheduler — must match the unsharded service.
    """
    from aid_tpu.parallel.ring_attention import make_cp_mesh
    from aid_tpu.serving import InpaintingService

    L = 2048
    audio = np.random.default_rng(1).standard_normal(3 * L).astype(
        np.float32) * 0.05
    mask = np.ones_like(audio)
    mask[1000:1100] = 0.0
    mask[4000:4100] = 0.0

    def _args(tmp):
        return compose(overrides=[
            "exp=test_cqtdiff_22k",
            f"exp.audio_len={L}",
            "network.cqt.num_octs=3",
            "network.cqt.bins_per_oct=8",
            "network.Ns=[8,16,16]",
            "network.num_dils=[1,1,1]",
            "network.attention_layers=[0,0,1,1]",
            "tester.T=8",
            "tester.diff_params.same_as_training=False",
            "tester.diff_params.Schurn=0.0",
            f"model_dir={tmp}",
        ])

    outs = []
    for mesh in (None, make_cp_mesh(4, n_dp=2)):
        args = _args(str(tmp_path / f"m{mesh is not None}"))
        b = asetup.setup_network(args)
        b.init(jax.random.PRNGKey(0), 1, L)
        ediff = asetup.setup_diff_parameters(args)
        srv = InpaintingService(
            args=args, bundle=b,
            sampler=asetup.setup_sampler(args, network=b, diff_params=ediff),
            max_batch=2)
        if mesh is not None:
            srv = srv.shard(mesh)
            assert srv.args.network["context_parallel"] is True
        outs.append(srv.inpaint(audio, mask, 22050, seed=3))

    single, sharded = outs
    np.testing.assert_array_equal(sharded[mask > 0.5], audio[mask > 0.5])
    np.testing.assert_allclose(sharded, single, atol=2e-3)


def test_full_score_cp_program_is_partitioned(tmp_path):
    """The cp program must contain cross-device collectives — otherwise the
    constraint silently no-op'd (e.g. a T-divisibility regression)."""
    b = _bundle(str(tmp_path), True)
    x = jnp.zeros((2, 2048), jnp.float32)
    cn = jnp.zeros((2, 1), jnp.float32)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    set_cp_mesh(Mesh(devs, (pmesh.DATA_AXIS, "cp")))
    txt = jax.jit(b.module.apply).lower(b.params, x, cn).compile().as_text()
    set_cp_mesh(None)
    assert txt.count("collective-permute") > 0   # conv halos / ring hops
