"""Attribute-access dict container.

Capability parity with the reference's ``dnnlib.EasyDict``
(reference: utils/dnnlib/util.py:39-52), extended with recursive wrapping so a
whole YAML config tree composes into nested attribute access.
"""
from __future__ import annotations

from typing import Any, Mapping


class EasyDict(dict):
    """dict with attribute access; recursively wraps nested mappings."""

    def __init__(self, *args: Any, **kwargs: Any) -> None:
        super().__init__(*args, **kwargs)
        for k, v in list(self.items()):
            self[k] = _wrap(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def __setitem__(self, name: str, value: Any) -> None:
        super().__setitem__(name, _wrap(value))

    def __delattr__(self, name: str) -> None:
        del self[name]

    def copy(self) -> "EasyDict":
        return EasyDict({k: v.copy() if isinstance(v, EasyDict) else v for k, v in self.items()})

    def to_dict(self) -> dict:
        def unwrap(v: Any) -> Any:
            if isinstance(v, EasyDict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)


def _wrap(v: Any) -> Any:
    if isinstance(v, EasyDict):
        return v
    if isinstance(v, Mapping):
        return EasyDict(v)
    if isinstance(v, list):
        return [_wrap(x) for x in v]
    return v
