"""Model introspection: parameter-table summary + shape assertion.

Capability parity with reference utils/torch_utils/misc.py:
``print_module_summary`` (:196-264, run once at trainer startup with dummy
input, trainer.py:75-80) and ``assert_shape`` (:81-94). A flax param pytree
plays the role of the torch module tree.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np


def assert_shape(x, ref_shape: Sequence[Optional[int]]) -> None:
    """Raise unless x.shape matches ref_shape (None = wildcard dim)."""
    if len(x.shape) != len(ref_shape):
        raise AssertionError(
            f"wrong number of dims: got {len(x.shape)}, expected {len(ref_shape)}")
    for i, (got, want) in enumerate(zip(x.shape, ref_shape)):
        if want is not None and int(got) != int(want):
            raise AssertionError(f"dim {i}: got {got}, expected {want}")


def param_table(params: Any, max_rows: int = 120) -> str:
    """Per-module parameter table + totals (the print_module_summary role)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    rows = []
    total = 0
    by_top = {}
    for path, v in flat:
        keys = [k.key for k in path]
        n = int(np.prod(v.shape)) if v.shape else 1
        total += n
        top = keys[1] if keys and keys[0] == "params" and len(keys) > 1 else keys[0]
        by_top[top] = by_top.get(top, 0) + n
        rows.append(("/".join(str(k) for k in keys), str(tuple(v.shape)), n))
    lines = [f"{'module':58s} {'params':>12s}"]
    for name, n in sorted(by_top.items()):
        lines.append(f"{name:58s} {n:12,d}")
    lines.append("-" * 72)
    lines.append(f"{'TOTAL':58s} {total:12,d}")
    if len(rows) <= max_rows:
        lines.append("")
        for name, shape, n in rows:
            lines.append(f"  {name:70s} {shape:>20s} {n:10,d}")
    return "\n".join(lines)


def print_model_summary(params: Any) -> int:
    print(param_table(params), flush=True)
    return sum(int(np.prod(v.shape)) if v.shape else 1
               for _, v in jax.tree_util.tree_flatten_with_path(params)[0])
