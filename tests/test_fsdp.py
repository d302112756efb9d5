"""FSDP/ZeRO training on the virtual 8-device mesh.

``exp.mesh.fsdp=True`` shards params + EMA + optimizer moments over the SAME
dp axis the batch is sharded on (aid_tpu/parallel/mesh.py fsdp_shardings);
XLA turns parameter uses into all-gathers and gradient contributions into
reduce-scatters inside the one jitted train step. These tests pin that (a)
state leaves are genuinely split (the memory claim is real), and (b) the
sharded optimizer trajectory is the replicated one.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu import setup as asetup
from aid_tpu.parallel import mesh as pmesh
from aid_tpu.utils.config import compose


def _args(tmp, batch, fsdp):
    return compose(overrides=[
        "exp=test_cqtdiff_22k",
        "exp.audio_len=2048",
        f"exp.batch={batch}",
        f"exp.mesh.fsdp={fsdp}",
        "exp.mesh.fsdp_min_size=256",   # tiny model: exercise real splits
        "network.cqt.num_octs=3",
        "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,16]",
        "network.num_dils=[1,1,1]",
        "network.attention_layers=[0,0,0,0]",
        f"model_dir={tmp}",
    ])


def _make_trainer(tmp, batch, fsdp):
    args = _args(tmp, batch, fsdp)
    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    tr = asetup.setup_trainer(args, dset=None, network=bundle,
                              diff_params=ediff)
    tr.key = jax.random.PRNGKey(7)
    tr.init_state()
    return tr


def test_fsdp_state_is_sharded(tmp_path):
    tr = _make_trainer(str(tmp_path), 8, True)
    fracs = []
    for leaf in jax.tree_util.tree_leaves(tr.state.params):
        if leaf.size >= 256:
            loc = leaf.addressable_shards[0].data.size
            fracs.append(loc / leaf.size)
    assert fracs and min(fracs) == pytest.approx(1 / 8), (
        "no param leaf is split 8-way")
    # optimizer moments follow the params
    mu_fracs = [
        leaf.addressable_shards[0].data.size / leaf.size
        for leaf in jax.tree_util.tree_leaves(tr.state.opt_state)
        if getattr(leaf, "size", 0) >= 256]
    assert mu_fracs and min(mu_fracs) == pytest.approx(1 / 8)


def test_fsdp_trajectory_matches_replicated(tmp_path):
    batch = 8
    rng = np.random.default_rng(0)
    steps = [(rng.standard_normal((batch, 2048)).astype(np.float32) * 0.063,
              np.full((batch,), 22050, np.int64)) for _ in range(3)]

    results = []
    for fsdp in (False, True):
        tr = _make_trainer(str(tmp_path / f"f{fsdp}"), batch, fsdp)
        for audio, fs in steps:
            m = tr.train_step(audio, fs)
        loss = float(np.asarray(m["loss"]))
        leaves = [np.asarray(jax.device_get(l)) for l in
                  jax.tree_util.tree_leaves(tr.state.params)]
        ema = [np.asarray(jax.device_get(l)) for l in
               jax.tree_util.tree_leaves(tr.state.ema)]
        results.append((loss, leaves, ema))

    (l0, p0, e0), (l1, p1, e1) = results
    assert l0 == pytest.approx(l1, rel=1e-4)
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(a, b, atol=2e-5)
    for a, b in zip(e0, e1):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_fsdp_checkpoint_roundtrip(tmp_path):
    """Sharded state saves through the standard checkpoint path and resumes
    (placement is re-derived at restore, so fsdp <-> replicated migrate)."""
    tr = _make_trainer(str(tmp_path), 8, True)
    audio = np.random.default_rng(1).standard_normal((8, 2048)).astype(
        np.float32) * 0.063
    fs = np.full((8,), 22050, np.int64)
    tr.train_step(audio, fs)
    path = tr.save_checkpoint()

    tr2 = _make_trainer(str(tmp_path), 8, True)
    assert tr2.resume_from_checkpoint(path)
    for a, b in zip(jax.tree_util.tree_leaves(tr.state.params),
                    jax.tree_util.tree_leaves(tr2.state.params)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))
    # resumed state is sharded again
    big = [l for l in jax.tree_util.tree_leaves(tr2.state.params)
           if l.size >= 256]
    assert min(l.addressable_shards[0].data.size / l.size for l in big) \
        == pytest.approx(1 / 8)
