"""Per-compile XLA:TPU options plumbing.

The axon remote compiler ignores client XLA_FLAGS (the local CPU flag parser
even rejects TPU-only flags), but proto-backed ``xla_tpu_*`` options ARE
forwarded when passed per-compile via ``jax.jit(compiler_options=...)``.

Knobs (env vars, all optional):
  AID_TPU_SCOPED_VMEM_KIB   raise the scoped-VMEM limit (default libtpu 16384;
                            more lets XLA build bigger fusions)
"""
from __future__ import annotations

import os
from typing import Optional


def compiler_options() -> Optional[dict]:
    opts = {}
    kib = os.environ.get("AID_TPU_SCOPED_VMEM_KIB")
    if kib:
        opts["xla_tpu_scoped_vmem_limit_kib"] = int(kib)
    return opts or None


def scoped_vmem_bytes() -> int:
    """The scoped-VMEM limit the next compile will run under (bytes)."""
    return int(os.environ.get("AID_TPU_SCOPED_VMEM_KIB", "16384")) * 1024


def enable_compile_cache() -> None:
    """Persistent XLA compile cache for the CLI entry points.

    The flagship guided sampler takes ~13 min to compile remotely; users
    should pay that once per (config, jax version), like bench.py always has.
    Opt out with AID_TPU_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("AID_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("AID_TPU_COMPILE_CACHE",
                       os.path.expanduser("~/.cache/aid_tpu_xla")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
