"""Tensor-parallel (Megatron-style) sharding of the denoiser itself.

Why this exists: the ``dp`` mesh (mesh.py / serving.shard) scales serving
THROUGHPUT — more windows per second — but a single long-gap chain is a
sequential loop of guided-Heun passes (reference
testing/edm_sampler_inpainting.py:178-262 has the same structure), and the
44k flagship is below 1x realtime on one chip by FLOPs physics alone
(PARITY.md: bf16 ceiling ~0.85x RT). The only route to lower PER-SCORE
latency is to split each score call across chips. This module does that the
TPU way: no manual collectives, no model edits — it assigns
``NamedSharding``s to the parameter pytree (conv / dense kernels split on
their output-channel axis over a ``tp`` mesh axis, everything else
replicated) and lets XLA's SPMD partitioner propagate the shardings through
the jitted program and insert the all-gathers / psums where the math needs
them (GroupNorm channel stats, attention heads, the regrouping reshapes).
Collectives ride ICI; the program stays the ONE compiled guided-Heun scan.

Composes with dp: a 2-D ("dp", "tp") mesh shards window batches on ``dp``
and every score's channel math on ``tp``. Serving exposes it via
``InpaintingService.shard(mesh)`` with a 2-D mesh; the Sampler picks it up
from parameter placement alone (jax follows committed input shardings).

int8 note: QWeight leaves (load-time prequantized kernels, ops/qconv.py) are
replicated, not split — the int8 path is a single-chip serving optimization
and tp targets multi-chip latency; combining them is rejected loudly.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aid_tpu.parallel.mesh import DATA_AXIS

MODEL_AXIS = "tp"


def make_tp_mesh(n_tp: int, n_dp: int = 1, devices=None) -> Mesh:
    """2-D ("dp", "tp") mesh over the first n_dp*n_tp devices.

    tp is the minor (fastest-varying) axis so tp groups sit on adjacent
    devices — on real hardware the per-score collectives then ride the
    shortest ICI hops while dp (one gradient/stat psum per step, or none at
    serving time) spans the longer dimension.
    """
    devs = list(devices if devices is not None else jax.devices())
    need = n_tp * n_dp
    if len(devs) < need:
        raise ValueError(f"need {need} devices for dp={n_dp} x tp={n_tp}, "
                         f"have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_dp, n_tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _tp_size(mesh: Mesh) -> int:
    return int(mesh.shape.get(MODEL_AXIS, 1))


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree: kernel output channels split over ``tp``.

    Rules (path-based, no model cooperation needed):
      * array leaves named ``kernel`` with ndim >= 2 and last dim divisible
        by the tp size -> P(..., "tp") on the last (output-feature) axis.
        This covers Conv2dFT [kh,kw,Ci,Co] and Dense [Ci,Co].
      * ``bias`` leaves whose length matches a split kernel would also be
        splittable, but XLA resolves the (replicated bias + split conv-out)
        add with a zero-cost reshard, so we keep every non-kernel leaf
        replicated for simplicity and checkpoint-layout stability.
      * QWeight leaves (int8 prequantized) -> error: tp+int8 unsupported.
    """
    from aid_tpu.ops.qconv import QWeight

    tp = _tp_size(mesh)
    repl = NamedSharding(mesh, P())

    def visit(path, leaf):
        if isinstance(leaf, QWeight):
            raise ValueError(
                "tensor-parallel serving does not compose with int8 "
                "prequantization (QWeight found at "
                f"{jax.tree_util.keystr(path)}); load with AID_TPU_QUANT=none")
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        is_kernel = bool(names) and names[-1] == "kernel"
        if (tp > 1 and is_kernel and getattr(leaf, "ndim", 0) >= 2
                and leaf.shape[-1] % tp == 0):
            spec = [None] * (leaf.ndim - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return repl

    return jax.tree_util.tree_map_with_path(
        visit, params, is_leaf=lambda x: isinstance(x, QWeight))


def place_params(params, mesh: Mesh):
    """Commit the parameter pytree onto the mesh with tp shardings.

    After this, any ``jax.jit`` program called with these arrays partitions
    its compute accordingly — the Sampler's guided-Heun scan needs no code
    change (jit derives the partitioning from committed input shardings).
    Multi-host meshes assemble global arrays from local slices with no
    collective (mesh.place), same as the dp replicate path.
    """
    from aid_tpu.parallel.mesh import place
    return place(params, param_shardings(params, mesh))
