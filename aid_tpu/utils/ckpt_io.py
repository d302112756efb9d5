"""Bounded-memory checkpoint IO: stream one leaf at a time.

Round-5 fix for a measured failure mode (VERDICT r4 weak #3 / PARITY round-4
finding 4): the orbax PyTreeCheckpointer save path buffered the whole ~3 GB
flagship state several times over — host RSS spiked ~14 GB during the it-30000
save (81.7 GB peak) and one relaunch was OOM-killed mid-save. This writer
holds AT MOST ONE leaf on the host at a time: device_get (or cross-process
allgather for non-addressable FSDP shards) -> np.save -> free, with a JSON
manifest describing the tree. Checkpoint layout:

  {name}.ckpt/
    stream_manifest.json   # nested tree; array leaves -> {"__npy__": file}
    a00000.npy ...         # one file per array leaf

``load()`` dispatches on the manifest: stream checkpoints load here, anything
else falls back to orbax — every pre-round-5 checkpoint stays loadable, and
loaders downstream see the SAME generic container tree orbax produced
(NamedTuples as field-name dicts), so ``trainer._restore_like`` and the
torch converter work unchanged.

Reference context: the reference torch.saves one flat dict (trainer.py:187-194)
and never hits this because torch serializes leaf-by-leaf already.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any

import numpy as np

MANIFEST = "stream_manifest.json"


def _pure(x) -> Any:
    """NamedTuple -> field dict, tuple/list -> list (the generic-container
    shape orbax restores to); everything else passes through."""
    if isinstance(x, tuple) and hasattr(x, "_fields"):
        return {f: _pure(getattr(x, f)) for f in x._fields}
    if isinstance(x, (list, tuple)):
        return [_pure(v) for v in x]
    if isinstance(x, dict):
        return {str(k): _pure(v) for k, v in x.items()}
    return x


def _fetch(leaf) -> np.ndarray:
    """One leaf to host: allgather non-addressable FSDP shards, else a plain
    device_get (aid_tpu/parallel/mesh.py gather_to_host semantics, per-leaf)."""
    import jax
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
    return np.asarray(jax.device_get(leaf))


def save_stream(path: str, payload) -> str:
    """Write ``payload`` (nested dict/list/NamedTuple of arrays + scalars)
    under ``path`` with one-leaf-at-a-time host residency. Atomic: builds
    ``path.tmp`` then renames."""
    tree = _pure(payload)
    tmp = path + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    counter = [0]

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if node is None or isinstance(node, (bool, int, float, str)):
            return node
        if isinstance(node, (np.integer,)):
            return int(node)
        if isinstance(node, (np.floating,)):
            return float(node)
        # array leaf: fetch -> write -> free before touching the next one
        arr = _fetch(node)
        fname = f"a{counter[0]:05d}.npy"
        counter[0] += 1
        np.save(os.path.join(tmp, fname), arr)
        del arr
        return {"__npy__": fname}

    manifest = walk(tree)
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f)
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return path


def is_stream(path: str) -> bool:
    return os.path.exists(os.path.join(path, MANIFEST))


def load(path: str):
    """Load a checkpoint directory: stream format if present, orbax otherwise
    (pre-round-5 checkpoints). Returns the generic container tree."""
    path = os.path.abspath(path)
    if not is_stream(path):
        import orbax.checkpoint as ocp
        return ocp.PyTreeCheckpointer().restore(path)
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)

    def walk(node):
        if isinstance(node, dict):
            if set(node.keys()) == {"__npy__"}:
                return np.load(os.path.join(path, node["__npy__"]))
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(manifest)
