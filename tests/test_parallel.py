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


def test_ring_attention_matches_dense():
    """Context-parallel ring attention over the 8-device cp mesh vs dense
    softmax attention: forward and gradients (the guidance backprop runs
    through attention at the coarse octaves)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from aid_tpu.parallel.ring_attention import ring_attention

    mesh = Mesh(np.array(jax.devices()), ("cp",))
    key = jax.random.PRNGKey(0)
    B, H, T, D = 2, 4, 64, 16
    q, k, v = (jax.random.normal(kk, (B, H, T, D))
               for kk in jax.random.split(key, 3))
    bias = jax.random.normal(jax.random.PRNGKey(9), (1, H, T, T)) * 0.3

    def dense(q, k, v, b):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (D ** -0.5)
        if b is not None:
            s = s + b
        return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, -1), v)

    for b in (None, bias):
        y1 = ring_attention(q, k, v, mesh, bias=b)
        y2 = dense(q, k, v, b)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-6)
    g1 = jax.grad(lambda qq: jnp.sum(jnp.sin(
        ring_attention(qq, k, v, mesh, bias=bias))))(q)
    g2 = jax.grad(lambda qq: jnp.sum(jnp.sin(dense(qq, k, v, bias))))(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


def test_model_context_parallel_attention():
    """UnetCQT with attention_dict.context_parallel=True over a cp mesh equals
    the single-device model (same params)."""
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from aid_tpu import setup as asetup
    from aid_tpu.parallel.ring_attention import set_cp_mesh
    from aid_tpu.utils.config import compose

    overrides = ["logging.print_model_summary=False", "model_dir=/tmp/aid_cp",
                 "network.Ns=[8,8]", "network.num_dils=[1,1]",
                 "network.attention_layers=[1,1,1]", "network.cqt.num_octs=2",
                 "network.cqt.bins_per_oct=8", "network.emb_dim=16",
                 "exp.audio_len=4096", "network.compute_dtype=float32"]
    args = compose(overrides=overrides)
    plain = asetup.setup_network(args)
    plain.init(jax.random.PRNGKey(0), 1, 4096)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4096)),
                    jnp.float32)
    cn = jnp.full((1, 1), -0.5, jnp.float32)
    y_ref = plain.module.apply(plain.params, x, cn)

    args2 = copy.deepcopy(args)
    args2.network["attention_dict"]["context_parallel"] = True
    cp_net = asetup.setup_network(args2)
    mesh = Mesh(np.array(jax.devices()[:4]), ("cp",))
    set_cp_mesh(mesh)
    try:
        y_cp = cp_net.module.apply(plain.params, x, cn)
    finally:
        set_cp_mesh(None)
    np.testing.assert_allclose(np.asarray(y_cp), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
