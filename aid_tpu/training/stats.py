"""Training-statistics aggregation: 3-moment counters, SPMD-native.

Capability parity with the reference's NVIDIA-style ``training_stats``
(utils/torch_utils/training_stats.py:55-98 ``report`` accumulates [n, sum(x),
sum(x^2)] per name; :233-265 all-reduces the moment deltas across ranks;
:112-229 ``Collector`` turns deltas into mean/std between updates).

TPU-first re-design: moments are computed *inside* the jitted train step as
plain jnp reductions — under pjit the mean over the global batch already rides
the same all-reduce XLA inserts for gradients, so there is no separate
collective, no mutable global registry, and no host sync until the host asks.
The per-sigma-bin loss histogram (reference trainer.py:210-234) is a segment
sum over static bin edges.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def moments(x: jnp.ndarray) -> jnp.ndarray:
    """[n, sum, sum_sq] of a (possibly empty) array, f32."""
    f = x.reshape(-1).astype(jnp.float32)
    return jnp.stack([jnp.asarray(f.size, jnp.float32), jnp.sum(f), jnp.sum(f * f)])


def sigma_binned_moments(loss_per_sample: jnp.ndarray, sigma: jnp.ndarray,
                         bin_edges: jnp.ndarray) -> jnp.ndarray:
    """Per-sigma-bin loss moments (reference trainer.py:210-234 binning).

    loss_per_sample: [B] mean squared error per sample
    sigma:           [B] or [B,1]
    bin_edges:       [num_bins+1] ascending (log-spaced over [sigma_min, sigma_max])
    returns:         [num_bins, 3] rows of [n, sum, sum_sq]
    """
    s = sigma.reshape(-1)
    l = loss_per_sample.reshape(-1).astype(jnp.float32)
    num_bins = bin_edges.shape[0] - 1
    idx = jnp.clip(jnp.searchsorted(bin_edges, s) - 1, 0, num_bins - 1)
    one = jnp.ones_like(l)
    n = jax.ops.segment_sum(one, idx, num_segments=num_bins)
    sm = jax.ops.segment_sum(l, idx, num_segments=num_bins)
    sq = jax.ops.segment_sum(l * l, idx, num_segments=num_bins)
    return jnp.stack([n, sm, sq], axis=-1)


def make_sigma_bins(sigma_min: float, sigma_max: float, num_bins: int) -> np.ndarray:
    """Log-spaced sigma bin edges (reference trainer.py:126-130)."""
    return np.exp(np.linspace(np.log(sigma_min), np.log(sigma_max), num_bins + 1))


@dataclasses.dataclass
class Collector:
    """Host-side accumulator of moment rows between flushes (the reference
    Collector's mean/std semantics, training_stats.py:112-229)."""
    _acc: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    def update(self, name: str, m) -> None:
        m = np.asarray(m, np.float64).reshape(-1, 3)
        tot = m.sum(axis=0)
        self._acc[name] = self._acc.get(name, np.zeros(3)) + tot

    def update_binned(self, name: str, m) -> None:
        m = np.asarray(m, np.float64)
        self._acc[name] = self._acc.get(name, np.zeros_like(m)) + m

    def mean(self, name: str):
        m = self._acc.get(name)
        if m is None:
            return float("nan")
        if m.ndim == 1:
            return m[1] / max(m[0], 1.0)
        return m[:, 1] / np.maximum(m[:, 0], 1.0)

    def std(self, name: str):
        m = self._acc.get(name)
        if m is None:
            return float("nan")
        mm = m if m.ndim == 2 else m[None]
        n = np.maximum(mm[:, 0], 1.0)
        mean = mm[:, 1] / n
        var = np.maximum(mm[:, 2] / n - mean ** 2, 0.0)
        out = np.sqrt(var)
        return out if m.ndim == 2 else float(out[0])

    def names(self) -> List[str]:
        return list(self._acc)

    def flush(self) -> None:
        self._acc.clear()
