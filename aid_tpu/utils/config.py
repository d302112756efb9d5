"""Hydra-style YAML config-group composition without the hydra dependency.

Capability parity with the reference's config system (reference conf/conf.yaml:1-7
composed by hydra decorators in train.py:79 / test.py:77): a root config declares
``defaults: [{group: name}, ...]``; each group loads ``conf/<group>/<name>.yaml``
under ``args.<group>``; CLI overrides use dotted paths (``exp.lr=1e-4``) and
group swaps (``tester=inpainting_tester_shortgaps``). Values are parsed with
``yaml.safe_load`` so ``1e-4``, ``[1,2]``, ``True``, ``None`` all round-trip.
"""
from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional, Sequence

import yaml

from .containers import EasyDict

DEFAULT_CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")


import re

_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _coerce(v: Any) -> Any:
    """YAML 1.1 reads '1e-4' as a string (no dot before the exponent);
    hydra/omegaconf coerce it — so do we, recursively."""
    if isinstance(v, dict):
        return {k: _coerce(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_coerce(x) for x in v]
    if isinstance(v, str) and _NUM_RE.match(v):
        return float(v)
    if v == "None":   # reference configs write literal None (hydra reads str)
        return None
    return v


def _load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        out = yaml.safe_load(f)
    return _coerce(out) or {}


def _deep_merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _set_dotted(tree: dict, dotted: str, value: Any) -> None:
    intentional = dotted.startswith("+")   # hydra-style "add new key" marker
    dotted = dotted.lstrip("+")
    keys = dotted.split(".")
    node = tree
    fresh = False
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            node[k] = {}
            fresh = True
        node = node[k]
    if (fresh or keys[-1] not in node) and not intentional:
        # hydra errors on unknown overrides; this permissive composer at
        # least warns — a silently-created key is usually a typo (e.g.
        # tester.inpainting.gap_length instead of ...inpainting.long.gap_length)
        import sys
        print(f"[config] NOTE: override creates NEW key {dotted!r} "
              f"(not present in the composed config — typo?)", file=sys.stderr)
    node[keys[-1]] = value


def parse_value(text: str) -> Any:
    try:
        return _coerce(yaml.safe_load(text))
    except yaml.YAMLError:
        return text


def compose(
    config_dir: str = DEFAULT_CONFIG_DIR,
    config_name: str = "conf",
    overrides: Optional[Sequence[str]] = None,
) -> EasyDict:
    """Compose the config tree from the root config + group files + CLI overrides.

    Returns a nested EasyDict with group names as top-level keys (dset, network,
    diff_params, tester, exp, logging), matching the reference's ``args`` layout.
    """
    root = _load_yaml(os.path.join(config_dir, config_name + ".yaml"))
    defaults: List[Dict[str, str]] = root.pop("defaults", [])
    group_choice: Dict[str, str] = {}
    for entry in defaults:
        if isinstance(entry, dict):
            for group, name in entry.items():
                group_choice[str(group)] = str(name)

    overrides = list(overrides or [])
    dotted_overrides: List[tuple] = []
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must be key=value, got {ov!r}")
        key, _, val = ov.partition("=")
        key = key.strip()
        if key in group_choice and "." not in key:
            group_choice[key] = val.strip()
        else:
            dotted_overrides.append((key, parse_value(val)))

    tree: dict = dict(root)
    for group, name in group_choice.items():
        # ``_alias: other`` files let the reference's own config names keep
        # working verbatim (e.g. network=paper_1912_unet_cqt_oct_attention_
        # adaLN_2 from /root/reference training.sh:28 resolves to
        # cqtdiff_plus_22k), like the registry's callable-string aliases.
        seen = set()
        overlays = []  # sibling keys of _alias files, most-specific first
        while True:
            if name in seen:
                raise ValueError(f"config alias cycle in group {group!r}: "
                                 f"{sorted(seen)}")
            seen.add(name)
            path = os.path.join(config_dir, group, name + ".yaml")
            loaded = _load_yaml(path)
            target = loaded.pop("_alias", None)
            if target is None:
                break
            if loaded:
                # an alias file may carry overrides next to _alias (e.g.
                # `_alias: cqtdiff_plus_22k` + `depth: 5`): deep-merge them
                # over the resolved target, most-specific file winning
                overlays.append(loaded)
            name = str(target)
        for over in reversed(overlays):
            loaded = _deep_merge(loaded, over)
        tree[group] = loaded
        tree[group]["name"] = tree[group].get("name", name)

    for key, val in dotted_overrides:
        _set_dotted(tree, key, val)

    return EasyDict(tree)


def save_config(args: EasyDict, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(args.to_dict(), f, sort_keys=False)


def load_saved_config(path: str) -> EasyDict:
    return EasyDict(_load_yaml(path))


def merge_config(args: EasyDict, over: dict) -> EasyDict:
    return EasyDict(_deep_merge(args.to_dict(), copy.deepcopy(over)))
