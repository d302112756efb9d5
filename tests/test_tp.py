"""Tensor-parallel (Megatron-style) serving on the virtual 8-device mesh.

The tp axis splits every conv/dense kernel's output channels
(aid_tpu/parallel/tp.py); XLA's SPMD partitioner propagates the shardings
through the full denoiser (GroupNorm stats, attention, the dilation
regrouping reshapes) and inserts the collectives. These tests pin that the
partitioned program is numerically the single-device program — forward, and
end-to-end through the guided-Heun serving path on a 2-D dp x tp mesh —
and that kernels are genuinely split (latency work is distributed, not
replicated).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu import setup as asetup
from aid_tpu.parallel import mesh as pmesh
from aid_tpu.parallel import tp
from aid_tpu.utils.config import compose


def _args(tmp, audio_len=2048, T=2, attn=(0, 0, 1, 1), extra=()):
    return compose(overrides=[
        "exp=test_cqtdiff_22k",
        f"exp.audio_len={audio_len}",
        "network.cqt.num_octs=3",
        "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,16]",
        "network.num_dils=[1,1,1]",
        f"network.attention_layers=[{','.join(str(a) for a in attn)}]",
        f"tester.T={T}",
        f"model_dir={tmp}",
        *extra,
    ])


def _init_bundle(args, L):
    bundle = asetup.setup_network(args)
    bundle.init(jax.random.PRNGKey(0), 1, L)
    return bundle


def test_param_shardings_split_kernel_out_channels(tmp_path):
    args = _args(str(tmp_path))
    bundle = _init_bundle(args, 2048)
    mesh = tp.make_tp_mesh(4, n_dp=2)
    sh = tp.param_shardings(bundle.params, mesh)

    flat_p = jax.tree_util.tree_leaves_with_path(bundle.params)
    flat_s = jax.tree_util.tree_leaves_with_path(sh)
    n_split = 0
    for (path, leaf), (_, s) in zip(flat_p, flat_s):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        spec = s.spec
        if names[-1] == "kernel" and leaf.ndim >= 2 and leaf.shape[-1] % 4 == 0:
            assert spec[-1] == tp.MODEL_AXIS, (names, leaf.shape, spec)
            n_split += 1
        else:
            assert all(a is None for a in spec), (names, leaf.shape, spec)
    assert n_split >= 10  # the model is mostly conv/dense kernels


def test_tp_forward_matches_replicated(tmp_path):
    args = _args(str(tmp_path))
    bundle = _init_bundle(args, 2048)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 2048)).astype(np.float32) * 0.1)
    cn = jnp.full((2, 1), 0.05, jnp.float32)

    y_ref = np.asarray(jax.jit(bundle.module.apply)(bundle.params, x, cn))

    mesh = tp.make_tp_mesh(4, n_dp=1)
    pp = tp.place_params(bundle.params, mesh)
    # the split is real: some kernel's local shard is 1/4 of its global cols
    shard_frac = [
        leaf.addressable_shards[0].data.shape[-1] / leaf.shape[-1]
        for leaf in jax.tree_util.tree_leaves(pp) if leaf.ndim >= 2]
    assert min(shard_frac) == pytest.approx(0.25)
    y_tp = np.asarray(jax.jit(bundle.module.apply)(pp, x, cn))

    # tolerance is f32 reduction-order noise: the tp partitioning changes
    # every contraction's summation order (measured tp=4 maxabs 8.5e-5 on
    # an O(0.5) output; GroupNorm's variance cancellation is the amplifier)
    np.testing.assert_allclose(y_tp, y_ref, atol=3e-4)


def test_dp_tp_serving_inpaint_matches_single_device(tmp_path):
    """End-to-end guided inpainting on a dp(2) x tp(4) mesh vs one device.

    Uses the DETERMINISTIC sampler operating point (Schurn=0): with churn
    and a random-init net the guided trajectory is chaotic — a 1e-6 param
    perturbation alone moves gap samples by 0.35 on ONE device — so any
    cross-sharding comparison of the stochastic trajectory is meaningless.
    The ODE trajectory is stable and pins the whole pipeline (score, VJP
    guidance, projection, window scheduler) across the partitioning.
    """
    from aid_tpu.serving import InpaintingService

    L = 2048
    audio = np.random.default_rng(1).standard_normal(3 * L).astype(
        np.float32) * 0.05
    mask = np.ones_like(audio)
    mask[1000:1100] = 0.0
    mask[4000:4100] = 0.0

    det = ("tester.diff_params.same_as_training=False",
           "tester.diff_params.Schurn=0.0")
    outs = []
    for mesh in (None, tp.make_tp_mesh(4, n_dp=2)):
        args = _args(str(tmp_path / f"m{mesh is not None}"), T=8, extra=det)
        bundle = _init_bundle(args, L)
        ediff = asetup.setup_diff_parameters(args)
        srv = InpaintingService(
            args=args, bundle=bundle,
            sampler=asetup.setup_sampler(args, network=bundle,
                                         diff_params=ediff),
            max_batch=2)
        if mesh is not None:
            srv = srv.shard(mesh)
        outs.append(srv.inpaint(audio, mask, 22050, seed=3))

    single, sharded = outs
    np.testing.assert_array_equal(sharded[mask > 0.5], audio[mask > 0.5])
    np.testing.assert_allclose(sharded, single, atol=2e-3)


def test_tp_rejects_int8_prequantized_params(tmp_path, monkeypatch):
    monkeypatch.setenv("AID_TPU_QUANT", "int8")
    args = _args(str(tmp_path))
    bundle = _init_bundle(args, 2048)
    from aid_tpu.ops.qconv import prequantize_params
    qparams = prequantize_params(bundle.params)
    mesh = tp.make_tp_mesh(4, n_dp=2)
    with pytest.raises(ValueError, match="int8"):
        tp.param_shardings(qparams, mesh)
