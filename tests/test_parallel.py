"""SPMD tests on the virtual 8-device CPU mesh: sharded training must be
numerically equivalent to single-device training (the collectives XLA inserts
for the dp axis change nothing), and the mesh helpers must shard as declared.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aid_tpu import setup as asetup
from aid_tpu.parallel import mesh as pmesh
from aid_tpu.utils.config import compose


def _args(tmp, batch):
    return compose(overrides=[
        "exp=test_cqtdiff_22k",
        "exp.audio_len=2048",
        f"exp.batch={batch}",
        "network.cqt.num_octs=3",
        "network.cqt.bins_per_oct=8",
        "network.Ns=[8,16,16]",
        "network.num_dils=[1,1,1]",
        "network.attention_layers=[0,0,0,0]",
        f"model_dir={tmp}",
    ])


def test_mesh_shapes():
    m = pmesh.make_mesh(-1)
    assert m.devices.size == 8
    m2 = pmesh.make_mesh(4)
    assert m2.devices.size == 4
    assert pmesh.local_batch_size(16, m) == 16


def test_shard_batch_places_on_dp_axis():
    m = pmesh.make_mesh(-1)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    g = pmesh.shard_batch(m, x)
    assert g.shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(g), x)
    # each device holds exactly one row
    shard_shapes = {tuple(s.data.shape) for s in g.addressable_shards}
    assert shard_shapes == {(1, 4)}


def test_sharded_step_matches_single_device(tmp_path):
    batch = 8
    audio = (np.random.default_rng(0).standard_normal((batch, 2048))
             .astype(np.float32) * 0.063)
    fs = np.full((batch,), 22050, np.int64)

    results = []
    for n_dev in (1, 8):
        args = _args(str(tmp_path / f"d{n_dev}"), batch)
        bundle = asetup.setup_network(args)
        ediff = asetup.setup_diff_parameters(args)
        tr = asetup.setup_trainer(args, dset=None, network=bundle,
                                  diff_params=ediff)
        tr.mesh = pmesh.make_mesh(n_dev)
        tr.key = jax.random.PRNGKey(7)
        tr.init_state()
        m = tr.train_step(audio, fs)
        results.append((float(np.asarray(m["loss"])),
                        np.asarray(jax.device_get(
                            jax.tree_util.tree_leaves(tr.state.params)[0]))))
    (l1, p1), (l8, p8) = results
    assert l1 == pytest.approx(l8, rel=1e-4)
    np.testing.assert_allclose(p1, p8, atol=1e-5)
