"""Network bundle: a flax module + its parameter pytree + the CQT transform.

The reference passes stateful ``nn.Module`` objects around (network with
``.CQTransform`` attribute, e.g. testing/edm_sampler_inpainting.py:62); the
JAX equivalent is this explicit (module, params) pair with a convenience
``apply``. Params stay a pytree so they shard/donate/EMA trivially.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class NetBundle:
    module: Any                     # flax linen module (e.g. UnetCQT)
    params: Any = None              # pytree, None until init/load
    name: str = "unet_cqt"

    @property
    def cqt(self):
        return getattr(self.module, "cqt", None)

    def init(self, key: jax.Array, batch: int, audio_len: int):
        x = jnp.zeros((batch, audio_len), jnp.float32)
        cn = jnp.zeros((batch, 1), jnp.float32)
        self.params = jax.jit(self.module.init)(key, x, cn)
        return self.params

    def apply(self, x: jnp.ndarray, cnoise: jnp.ndarray) -> jnp.ndarray:
        return self.module.apply(self.params, x, cnoise)

    def apply_fn(self):
        """(params, x, cnoise) -> y, for use inside jitted closures."""
        return self.module.apply

    def n_params(self) -> int:
        return sum(int(v.size) for v in jax.tree_util.tree_leaves(self.params))
