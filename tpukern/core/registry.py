"""Variant registry: the TPU analog of the reference's pybind export tables.

The reference exposes every kernel variant as a bound function on a torch
extension module (e.g. kernels/hgemm/pybind/hgemm.cc:8-107 exports 33
functions; kernels/elementwise/elementwise.cu:170-177 exports 6). Pallas
kernels need no bindings — the callable IS the op — so the registry is a
plain table: family -> variant name -> Variant(fn, ref, flops model, tags).

Harnesses and tests iterate this table to get reference-style uniform
coverage of every variant.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable


@dataclasses.dataclass
class Variant:
    family: str
    name: str
    fn: Callable
    ref: Callable | None = None          # XLA reference implementation
    flops: Callable | None = None        # (*args) -> flop count
    bytes_moved: Callable | None = None  # (*args) -> bytes touched in HBM
    tags: tuple[str, ...] = ()
    doc: str = ""

    def __call__(self, *args: Any, **kw: Any):
        return self.fn(*args, **kw)


_REGISTRY: dict[str, dict[str, Variant]] = {}


def register(family: str, name: str, *, ref=None, flops=None, bytes_moved=None,
             tags=(), doc=""):
    """Decorator registering a kernel variant under (family, name)."""
    def deco(fn):
        fam = _REGISTRY.setdefault(family, {})
        fam[name] = Variant(family, name, fn, ref=ref, flops=flops,
                            bytes_moved=bytes_moved, tags=tuple(tags), doc=doc)
        return fn
    return deco


def get(family: str, name: str) -> Variant:
    return _REGISTRY[family][name]


def variants(family: str) -> dict[str, Variant]:
    return dict(_REGISTRY.get(family, {}))


def families() -> list[str]:
    return sorted(_REGISTRY)
