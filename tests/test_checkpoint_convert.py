"""Checkpoint-converter tests (SURVEY.md §4 gate (3) mechanics).

No released .pt is reachable in this environment (zero egress), so the
converter is validated by ROUNDTRIP: take a freshly-initialized flax tree,
inverse-map every leaf to its reference torch key + torch tensor layout
(derived from networks/unet_cqt_oct_with_projattention_adaLN_2.py), build that
synthetic torch state dict, convert it back, and require bit-identity and full
coverage. This proves the name map is bijective and every layout transform is
its inverse's inverse; real-checkpoint numerics get checked the first time a
.pt is present (tests auto-skip).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aid_tpu.models.unet_cqt import UnetCQT
from aid_tpu.ops.cqt import get_cqt
from aid_tpu.utils import checkpoint_torch as ckpt

TINY = dict(num_octs=3, bins_per_oct=8, fs=4096.0, audio_len=2048)


@pytest.fixture(scope="module")
def flax_params():
    cqt = get_cqt(**TINY)
    model = UnetCQT(
        cqt=cqt, Ns=(8, 16, 16), num_dils=(1, 2, 2),
        attention_layers=(0, 1, 1, 1),
        attention=dict(num_heads=2, bias_qkv=False, use_rel_pos=True),
        emb_dim=32, use_norm=True, use_fencoding=False,
    )
    x = jnp.zeros((1, TINY["audio_len"]))
    cn = jnp.zeros((1, 1))
    return jax.jit(model.init)(jax.random.PRNGKey(0), x, cn)


def _inverse_value(path, v):
    """flax leaf -> torch tensor layout (inverse of ckpt.translate_value)."""
    v = np.asarray(v)
    leaf, parent = path[-1], path[-2] if len(path) >= 2 else ""
    if leaf == "gamma":
        return v.reshape(1, -1, 1, 1)
    if leaf in ("rff_freq", "embedding", "bias"):
        return v
    if parent == "qk":
        return v.T[:, :, None]
    if v.ndim == 4:
        return v.transpose(3, 2, 0, 1)
    if v.ndim == 2:
        return v.T
    raise AssertionError(path)


def _inverse_key(path):
    """flax path -> torch state-dict key (inverse of ckpt.translate_key)."""
    top = path[0]
    if top == "embedding":
        if path[1] == "rff_freq":
            return "embedding.RFF_freq"
        k = path[1].split("_")[1]
        leaf = "weight" if path[2] == "kernel" else "bias"
        return f"embedding.MLP.{k}.{leaf}"
    kind = None
    if top.startswith("down_"):
        _, i, what = top.split("_")
        prefix = {"init": f"downs.{i}.0", "pyr": f"downs.{i}.1",
                  "res": f"downs.{i}.2"}[what]
        if what == "pyr":
            return prefix + ".weight"
    elif top.startswith("mid_"):
        _, m, what = top.split("_")
        prefix = f"middle.{m}." + ("0" if what == "out" else "1")
    elif top.startswith("up_"):
        _, j, what = top.split("_")
        prefix = f"ups.{j}." + ("0" if what == "out" else "1")
    else:
        raise AssertionError(top)
    rest = path[1:]
    h = rest[0]
    if h in ("proj_in", "proj_out", "res_conv"):
        return f"{prefix}.{h}.weight"
    if h.startswith("conv_"):
        return f"{prefix}.H.{h.split('_')[1]}.weight"
    if h == "norm_attn":
        return f"{prefix}.norm2.gamma"
    if h in ("affine_attn", "gate_attn"):
        leaf = "weight" if rest[1] == "kernel" else "bias"
        return f"{prefix}.{h.split('_')[0]}2.{leaf}"
    if h.startswith("norm_"):
        return f"{prefix}.norm.{h.split('_')[1]}.gamma"
    if h.startswith(("affine_", "gate_")):
        kind, k = h.split("_")
        leaf = "weight" if rest[1] == "kernel" else "bias"
        return f"{prefix}.{kind}.{k}.{leaf}"
    if h == "attn":
        sub = rest[1]
        if sub == "rel_pos":
            return f"{prefix}.attn_block.rel_pos.relative_attention_bias.weight"
        leaf = "weight" if rest[2] == "kernel" else "bias"
        return f"{prefix}.attn_block.{sub}.{leaf}"
    raise AssertionError(path)


def test_roundtrip_bijective(flax_params):
    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    sd = {}
    for path, v in flat:
        p = tuple(k.key for k in path)
        key = _inverse_key(p)
        assert key not in sd, f"duplicate torch key {key}"
        sd[key] = _inverse_value(p, v)
    converted = ckpt.convert_state_dict(sd, flax_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        converted, flax_params)


def test_find_state_dict_strategies(flax_params):
    sd = {"downs.0.1.weight": np.zeros((8, 2, 5, 3))}
    assert ckpt._find_state_dict({"ema": sd}) is sd
    assert ckpt._find_state_dict({"network": sd}) is sd
    assert ckpt._find_state_dict({"state_dict": sd}) is sd
    z = ckpt._find_state_dict({"model": sd, "ema_weights": [sd["downs.0.1.weight"]]})
    assert list(z) == ["downs.0.1.weight"]
    # 'diffusion.'-prefixed raw dict
    z2 = ckpt._find_state_dict({"diffusion.downs.0.1.weight": sd["downs.0.1.weight"]})
    assert list(z2) == ["downs.0.1.weight"]


def test_shape_mismatch_raises(flax_params):
    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    sd = {}
    for path, v in flat:
        p = tuple(k.key for k in path)
        sd[_inverse_key(p)] = _inverse_value(p, v)
    bad = dict(sd)
    k0 = next(k for k in bad if k.endswith("H.0.weight"))
    bad[k0] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(ValueError):
        ckpt.convert_state_dict(bad, flax_params)


def test_load_reference_pt_end_to_end(flax_params, tmp_path):
    """Full path: torch.save a reference-layout checkpoint dict
    ({'it','network','optimizer','ema','args'}, trainer.py:187-194 format)
    -> Tester-style load through checkpoint_torch.load_reference_checkpoint."""
    import torch
    from aid_tpu.models.bundle import NetBundle
    from aid_tpu.models.unet_cqt import UnetCQT
    from aid_tpu.ops.cqt import get_cqt

    flat = jax.tree_util.tree_flatten_with_path(flax_params["params"])[0]
    sd = {}
    for path, v in flat:
        p = tuple(k.key for k in path)
        sd[_inverse_key(p)] = torch.from_numpy(
            np.asarray(_inverse_value(p, v)).copy())
    payload = {"it": 750000, "network": sd, "ema": sd, "optimizer": {},
               "args": {"exp": {"audio_len": TINY["audio_len"]}}}
    pt = str(tmp_path / "maestro_tiny-750000.pt")
    torch.save(payload, pt)

    cqt = get_cqt(**TINY)
    model = UnetCQT(cqt=cqt, Ns=(8, 16, 16), num_dils=(1, 2, 2),
                    attention_layers=(0, 1, 1, 1),
                    attention=dict(num_heads=2, bias_qkv=False,
                                   use_rel_pos=True),
                    emb_dim=32)
    bundle = NetBundle(module=model, params=flax_params)
    loaded = ckpt.load_reference_checkpoint(pt, bundle)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        loaded, flax_params)
    # and the loaded tree actually drives the network
    bundle.params = loaded
    y = bundle.apply(jnp.zeros((1, TINY["audio_len"])), jnp.zeros((1, 1)))
    assert y.shape == (1, TINY["audio_len"])


def test_export_state_dict_roundtrips(flax_params):
    """The shipped exporter (flax -> reference torch layout) inverts the
    importer bit-exactly and agrees with the test-local inverse grammar."""
    sd = ckpt.export_state_dict(flax_params)
    back = ckpt.convert_state_dict(sd, flax_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        back, flax_params)


def test_export_checkpoint_pt_loads_back(flax_params, tmp_path):
    import torch
    from aid_tpu.ops.cqt import get_cqt
    from aid_tpu.models.bundle import NetBundle

    class _B:  # minimal bundle facade for the exporter/loader
        params = flax_params

    p = str(tmp_path / "exported-123.pt")
    ckpt.export_checkpoint(p, _B, it=123)
    payload = torch.load(p, map_location="cpu", weights_only=False)
    assert payload["it"] == 123
    assert set(payload) == {"it", "network", "ema", "optimizer"}
    converted = ckpt.load_reference_checkpoint(p, _B)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        converted, flax_params)
