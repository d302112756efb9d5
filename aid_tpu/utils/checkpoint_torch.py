"""Reference-checkpoint converter: torch .pt state dicts -> flax param pytree.

The released CQTDiff+ checkpoints (maestro_22k_8s-750000.pt,
musicnet_44k_4s-560000.pt) carry {'it','network','optimizer','ema','args'}
(reference training/trainer.py:187-194); testers consume the EMA weights
(reference testing/tester_inpainting.py:195-202 via utils/training_utils.py:214).
This module maps every parameter of the reference
``Unet_CQT_oct_with_attention`` (networks/unet_cqt_oct_with_projattention_
adaLN_2.py) onto the UnetCQT flax tree:

  torch module path                       flax path
  embedding.RFF_freq                      embedding/rff_freq
  embedding.MLP.{k}.{weight,bias}         embedding/mlp_{k}/{kernel.T,bias}
  downs.{i}.0.*                           down_{i}_init/*
  downs.{i}.1.weight                      down_{i}_pyr/kernel
  downs.{i}.2.*                           down_{i}_res/*
  middle.{m}.0.*                          mid_{m}_out/*     (OutBlock first!)
  middle.{m}.1.*                          mid_{m}_res/*
  ups.{j}.0.*                             up_{j}_out/*
  ups.{j}.1.*                             up_{j}_res/*

and inside a ResnetBlock (reference networks:382-493 -> AdaLNResBlock):

  proj_in.weight / proj_out.weight / res_conv.weight -> */kernel  (OIHW->HWIO)
  H.{k}.weight                            conv_{k}/kernel
  norm.{k}.gamma [1,N,1,1]                norm_{k}/gamma [N]
  affine.{k}.{weight,bias}                affine_{k}/{kernel.T,bias}
  gate.{k}.{weight,bias}                  gate_{k}/{kernel.T,bias}
  norm2.gamma                             norm_attn/gamma
  affine2 / gate2                         affine_attn / gate_attn
  attn_block.proj_in.weight [H,C,1,1]     attn/proj_in/kernel [1,1,C,H]
  attn_block.proj_out.weight              attn/proj_out/kernel
  attn_block.qk.weight [2HF,HF,1]         attn/qk/kernel [HF,2HF]
  attn_block.qk.bias                      attn/qk/bias
  attn_block.rel_pos.relative_attention_bias.weight -> attn/rel_pos/embedding

Loading is tolerant in the spirit of the reference's 7-strategy loader
(utils/training_utils.py:214-382): the state dict is located under
'ema' -> 'network' -> 'state_dict' -> the dict itself, and 'model'+'ema_weights'
zips are reconstructed.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


# ----------------------------------------------------------- key translation

def _translate_block(rest: str) -> Tuple[str, ...]:
    """Map a ResnetBlock-relative torch key to the flax path inside
    AdaLNResBlock."""
    parts = rest.split(".")
    head = parts[0]
    if head in ("proj_in", "proj_out", "res_conv"):
        return (head, "kernel")
    if head == "H":
        return (f"conv_{parts[1]}", "kernel")
    if head == "norm":
        return (f"norm_{parts[1]}", "gamma")
    if head in ("affine", "gate"):
        leaf = "kernel" if parts[2] == "weight" else "bias"
        return (f"{head}_{parts[1]}", leaf)
    if head == "norm2":
        return ("norm_attn", "gamma")
    if head in ("affine2", "gate2"):
        leaf = "kernel" if parts[1] == "weight" else "bias"
        return (f"{head[:-1]}_attn", leaf)
    if head == "attn_block":
        sub = parts[1]
        if sub in ("proj_in", "proj_out"):
            return ("attn", sub, "kernel")
        if sub == "qk":
            return ("attn", "qk", "kernel" if parts[2] == "weight" else "bias")
        if sub == "rel_pos":
            return ("attn", "rel_pos", "embedding")
    raise KeyError(f"unrecognized ResnetBlock key: {rest!r}")


def translate_key(key: str) -> Tuple[str, ...]:
    """Full torch state-dict key -> flax param path (tuple of names)."""
    parts = key.split(".")
    if parts[0] == "embedding":
        if parts[1] == "RFF_freq":
            return ("embedding", "rff_freq")
        if parts[1] == "MLP":
            leaf = "kernel" if parts[3] == "weight" else "bias"
            return ("embedding", f"mlp_{parts[2]}", leaf)
    if parts[0] == "freq_encodings":
        return (f"fenc_{parts[1]}", "rff_freq")
    if parts[0] == "downs":
        i, slot = parts[1], parts[2]
        rest = ".".join(parts[3:])
        if slot == "0":
            return (f"down_{i}_init",) + _translate_block(rest)
        if slot == "1":
            return (f"down_{i}_pyr", "kernel")
        if slot == "2":
            return (f"down_{i}_res",) + _translate_block(rest)
    if parts[0] == "middle":
        m, slot = parts[1], parts[2]
        rest = ".".join(parts[3:])
        name = f"mid_{m}_out" if slot == "0" else f"mid_{m}_res"
        return (name,) + _translate_block(rest)
    if parts[0] == "ups":
        j, slot = parts[1], parts[2]
        rest = ".".join(parts[3:])
        name = f"up_{j}_out" if slot == "0" else f"up_{j}_res"
        return (name,) + _translate_block(rest)
    raise KeyError(f"unrecognized checkpoint key: {key!r}")


def translate_value(path: Tuple[str, ...], w: np.ndarray) -> np.ndarray:
    """Apply the tensor-layout transform for a translated path."""
    w = np.asarray(w, np.float32)
    leaf = path[-1]
    parent = path[-2] if len(path) >= 2 else ""
    if leaf == "gamma":                     # [1,N,1,1] or [1,1,N] -> [N]
        return w.reshape(-1)
    if leaf == "rff_freq" or leaf == "embedding" or leaf == "bias":
        return w
    # kernels
    if parent == "qk":                      # Conv1d [out,in,1] -> [in,out]
        return w[:, :, 0].T
    if w.ndim == 4:                         # Conv2d OIHW -> HWIO
        return w.transpose(2, 3, 1, 0)
    if w.ndim == 2:                         # Linear [out,in] -> [in,out]
        return w.T
    raise ValueError(f"unhandled tensor at {'/'.join(path)}: shape {w.shape}")


# ----------------------------------------------------------------- public API

def _find_state_dict(payload) -> Dict[str, Any]:
    """Locate the network weights inside a reference checkpoint payload
    (tolerant-order semantics of reference training_utils.py:214-382)."""
    if not isinstance(payload, dict):
        raise ValueError("checkpoint payload is not a dict")
    for key in ("ema", "network", "state_dict"):
        sd = payload.get(key)
        if isinstance(sd, dict) and sd:
            return sd
    if "model" in payload and "ema_weights" in payload:
        return dict(zip(payload["model"].keys(), payload["ema_weights"]))
    # maybe the payload IS the state dict ('diffusion.' prefixes stripped)
    if any(hasattr(v, "shape") for v in payload.values()):
        return {k.removeprefix("diffusion."): v for k, v in payload.items()}
    raise ValueError(f"no weights found; keys = {list(payload)[:8]}")


def convert_state_dict(sd: Dict[str, Any], flax_params: Dict) -> Dict:
    """Torch state dict -> flax {'params': ...} tree shaped like flax_params.

    Every torch tensor must land on an existing leaf with matching shape;
    every flax leaf must be covered. Raises with a precise diff otherwise.
    """
    import jax

    target = flax_params["params"] if "params" in flax_params else flax_params
    flat = jax.tree_util.tree_flatten_with_path(target)[0]
    flat_target = {tuple(k.key for k in path): v for path, v in flat}
    out: Dict[Tuple[str, ...], np.ndarray] = {}
    skipped = []
    for key, w in sd.items():
        if key.endswith("kernel") and ("downsampler" in key or "upsampler" in key):
            continue  # FIR buffers, not parameters
        try:
            path = translate_key(key)
        except KeyError:
            skipped.append(key)
            continue
        w = np.asarray(getattr(w, "numpy", lambda: w)()
                       if hasattr(w, "numpy") else w)
        v = translate_value(path, w)
        if path not in flat_target:
            raise KeyError(f"{key} -> {'/'.join(path)} not in the flax tree")
        if tuple(v.shape) != tuple(flat_target[path].shape):
            raise ValueError(
                f"{key} -> {'/'.join(path)}: shape {v.shape} vs "
                f"expected {tuple(flat_target[path].shape)}")
        out[path] = v
    missing = set(flat_target) - set(out)
    if missing:
        raise KeyError(f"flax leaves not covered by checkpoint: "
                       f"{sorted('/'.join(m) for m in missing)[:8]} "
                       f"({len(missing)} total)")
    if skipped:
        print(f"[convert] skipped {len(skipped)} non-network keys")

    def rebuild(tree, prefix=()):
        if hasattr(tree, "shape"):
            return out[prefix]
        return {k: rebuild(v, prefix + (k,)) for k, v in tree.items()}

    new_params = rebuild(target)
    return {"params": new_params} if "params" in flax_params else new_params


def _inverse_translate_key(path: Tuple[str, ...]) -> str:
    """flax param path -> reference torch state-dict key (exact inverse of
    ``translate_key``; used by the exporter)."""
    top = path[0]
    if top == "embedding":
        if path[1] == "rff_freq":
            return "embedding.RFF_freq"
        k = path[1].split("_")[1]
        return f"embedding.MLP.{k}." + ("weight" if path[2] == "kernel"
                                        else "bias")
    if top.startswith("fenc_"):
        return f"freq_encodings.{top.split('_')[1]}.rff_freq"
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
        raise KeyError(f"unmapped flax path {path!r}")
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
    raise KeyError(f"unmapped flax path {path!r}")


def _inverse_translate_value(path: Tuple[str, ...], v) -> np.ndarray:
    """flax leaf -> torch tensor layout (inverse of ``translate_value``)."""
    v = np.asarray(v, np.float32)
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
    raise ValueError(f"unhandled tensor at {'/'.join(path)}: shape {v.shape}")


def export_state_dict(flax_params: Dict) -> Dict[str, np.ndarray]:
    """Flax param tree -> reference-layout torch state dict (numpy values).

    The inverse of ``convert_state_dict``: lets a model trained in this
    framework be consumed by the reference PyTorch code (or compared against
    torch tooling). Round-trips bit-exactly with the importer.
    """
    import jax

    target = flax_params["params"] if "params" in flax_params else flax_params
    flat = jax.tree_util.tree_flatten_with_path(target)[0]
    out: Dict[str, np.ndarray] = {}
    for p, v in flat:
        path = tuple(k.key for k in p)
        key = _inverse_translate_key(path)
        if key in out:
            raise KeyError(f"duplicate torch key {key} from {path}")
        out[key] = _inverse_translate_value(path, np.asarray(v))
    return out


def export_checkpoint(path: str, bundle, it: int = 0,
                      ema_params: Dict = None) -> str:
    """Write a reference-format .pt checkpoint
    ({'it','network','ema','optimizer'} — trainer.py:187-194 layout) loadable
    by the upstream code. Requires torch."""
    import torch

    net_sd = {k: torch.from_numpy(v.copy())
              for k, v in export_state_dict(bundle.params).items()}
    ema_sd = ({k: torch.from_numpy(v.copy())
               for k, v in export_state_dict(ema_params).items()}
              if ema_params is not None else net_sd)
    torch.save({"it": int(it), "network": net_sd, "ema": ema_sd,
                "optimizer": {}}, path)
    return path


def load_reference_checkpoint(path: str, bundle) -> Dict:
    """Load a reference .pt and return converted flax params for `bundle`.

    bundle.params must be initialized (shapes are validated against it).
    """
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = _find_state_dict(payload)
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in sd.items()}
    if bundle.params is None:
        raise ValueError("initialize bundle params before loading (shapes "
                         "are validated against the flax tree)")
    return convert_state_dict(sd, bundle.params)
