"""Context-parallel (ring) attention over the time axis via shard_map.

The reference handles long sequences purely algorithmically (octave CQT time
halving + projection attention only at coarse octaves + autoregressive
outpainting; SURVEY.md section 5 "long-context"), which is enough for the
8-second flagship segments. This module is the idiomatic TPU scaling story
beyond that: shard the TIME axis of the projection-attention block over a
``cp`` mesh axis and run blockwise (flash-style) attention with K/V rotating
around the ICI ring via ``ppermute`` — memory per chip O(T/n) instead of
O(T^2), exact to the dense softmax attention (running max/denominator
accumulation, f32).

Used by models.unet_cqt.TimeAttention when a mesh with a ``cp`` axis is
installed (attention_dict.context_parallel in the network config); validated
against dense attention on the virtual 8-device CPU mesh in
tests/test_parallel.py.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

CP_AXIS = "cp"


def _block_attn(q, k, v, bias, scale, m, l, o):
    """One ring step: accumulate a K/V block into the running softmax state.

    q: [B, H, Tq, D]; k, v: [B, H, Tk, D]; bias: [1, H, Tq, Tk] or None;
    m, l: [B, H, Tq] running rowmax / denominator; o: [B, H, Tq, D].
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_new[..., None])
    corr = jnp.exp(m - m_new)
    l_new = l * corr + jnp.sum(p, axis=-1)
    o_new = o * corr[..., None] + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return m_new, l_new, o_new


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, bias: Optional[jnp.ndarray] = None,
                   scale: Optional[float] = None,
                   axis: str = CP_AXIS) -> jnp.ndarray:
    """softmax(q k^T * scale + bias) v with the T axis sharded over ``axis``.

    q, k, v: [B, H, T, D] (global shapes; T divisible by the axis size).
    bias:    [1, H, T, T] (global) or None.
    Exact (up to f32 reassociation) vs dense attention; K/V travel the ring
    once, overlapping compute with ICI ppermutes.
    """
    n = mesh.shape[axis]
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    if n == 1:
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        if bias is not None:
            s = s + bias.astype(jnp.float32)
        a = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", a, v.astype(jnp.float32)
                          ).astype(q.dtype)

    Tb = q.shape[2] // n

    def local(qb, kb, vb, biasb):
        # qb, kb, vb: [B, H, T/n, D]; biasb: [1, H, T/n, T] or None
        idx = jax.lax.axis_index(axis)
        B, H, Tq, D = qb.shape
        m = jnp.full((B, H, Tq), -jnp.inf, jnp.float32)
        l = jnp.zeros((B, H, Tq), jnp.float32)
        o = jnp.zeros((B, H, Tq, D), jnp.float32)
        perm = [(i, (i - 1) % n) for i in range(n)]

        def body(step, carry):
            kb_, vb_, m_, l_, o_ = carry
            # the K/V block now held started at ring position (idx + step)
            src = (idx + step) % n
            if biasb is not None:
                bb = jax.lax.dynamic_slice_in_dim(biasb, src * Tb, Tb, axis=3)
            else:
                bb = None
            m_, l_, o_ = _block_attn(qb, kb_, vb_, bb, scale, m_, l_, o_)
            kb_ = jax.lax.ppermute(kb_, axis, perm)
            vb_ = jax.lax.ppermute(vb_, axis, perm)
            return kb_, vb_, m_, l_, o_

        carry = (kb, vb, m, l, o)
        carry = jax.lax.fori_loop(0, n, body, carry)
        _, _, m, l, o = carry
        return (o / l[..., None]).astype(qb.dtype)

    sh = P(None, None, axis, None)
    if bias is not None:
        fn = jax.shard_map(local, mesh=mesh, in_specs=(sh, sh, sh, sh),
                           out_specs=sh, check_vma=False)
        return fn(q, k, v, bias)
    fn = jax.shard_map(lambda a, b, c: local(a, b, c, None), mesh=mesh,
                       in_specs=(sh, sh, sh), out_specs=sh, check_vma=False)
    return fn(q, k, v)


# ---------------------------------------------------------------------------
# Current context-parallel mesh. Installed by the orchestration layer (or a
# user script) before building/jitting the model; TimeAttention picks it up
# when the network config asks for context parallelism.

_CP_MESH: Optional[Mesh] = None


def set_cp_mesh(mesh: Optional[Mesh]) -> None:
    """Install (or clear, with None) the mesh whose ``cp`` axis shards time.

    The mesh is read at TRACE time and is not part of any jit cache key, so a
    program jitted under the old value would silently keep it; to make the
    switch sound we drop all jit caches whenever the value actually changes
    (this is a setup-time operation — retracing afterwards is expected).
    """
    global _CP_MESH
    if mesh is not None and CP_AXIS not in mesh.axis_names:
        raise ValueError(f"mesh has no '{CP_AXIS}' axis: {mesh.axis_names}")
    if mesh is not _CP_MESH:
        import jax
        jax.clear_caches()
    _CP_MESH = mesh


def get_cp_mesh() -> Optional[Mesh]:
    return _CP_MESH


def make_cp_mesh(n_cp: int, n_dp: int = 1, devices=None) -> Mesh:
    """2-D ("dp", "cp") mesh over the first n_dp*n_cp devices.

    cp is the minor (fastest-varying) axis so each score's halo exchanges
    and ring hops ride adjacent-device ICI links; dp (no collectives at
    serving time) spans the longer dimension. Counterpart of
    ``parallel.tp.make_tp_mesh`` for the context-parallel latency route
    (``InpaintingService.shard``).
    """
    import numpy as np

    from aid_tpu.parallel.mesh import DATA_AXIS
    devs = list(devices if devices is not None else jax.devices())
    need = n_cp * n_dp
    if len(devs) < need:
        raise ValueError(f"need {need} devices for dp={n_dp} x cp={n_cp}, "
                         f"have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_dp, n_cp)
    return Mesh(grid, (DATA_AXIS, CP_AXIS))
