"""Semiring registry: (⊕ monoid, ⊗ binary) pairs compiled to Column exprs.

The reference composes semirings from monoid × binaryop at runtime
(``graphblas/core/operator/semiring.py:174-204``, ``get_semiring``
``core/operator/utils.py:135-233``).  Our kernels (mxm/mxv/vxm) are
parametrized by a ``Semiring`` carrying:

  * ``mul(a, b) -> Column``     the ⊗ applied to joined edge/vector values
  * ``add_agg(c) -> Column``    the ⊕ as a Spark aggregate (partial+final
                                aggregation == map-side combine, free)
  * ``identity``                the ⊕ identity (needed by blocked kernels)

All fast-path semirings stay JVM-side (whole-stage codegen); the blocked-CSR
kernel path (operators/blocks.py) additionally knows how to evaluate the same
semiring vectorized in numpy inside Arrow UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
from pyspark.sql import Column

from graph_python_spark.functions.ops import Monoid, binary, monoid


@dataclass(frozen=True)
class Semiring:
    name: str
    add: Monoid
    mul: Callable[[Column, Column], Column]
    # numpy twins for the blocked/Arrow kernel path
    np_add: Any = None          # ufunc with .reduceat / .reduce
    np_mul: Any = None          # callable (a, b) -> ndarray
    identity: Any = None

    def add_agg(self, c: Column) -> Column:
        return self.add.agg(c)

    def __repr__(self) -> str:
        return f"semiring.{self.name}"


def _np_first(a, b):
    return np.broadcast_to(a, np.broadcast_shapes(np.shape(a), np.shape(b)))


def _np_second(a, b):
    return np.broadcast_to(b, np.broadcast_shapes(np.shape(a), np.shape(b)))


def _np_pair(a, b):
    return np.ones(np.broadcast_shapes(np.shape(a), np.shape(b)))


_REGISTRY: dict[str, Semiring] = {}


def _register(name: str, add: Monoid, mul, np_add, np_mul, identity) -> Semiring:
    sr = Semiring(name, add, mul, np_add, np_mul, identity)
    _REGISTRY[name] = sr
    return sr


class _SemiringNamespace:
    """``semiring.plus_times`` etc. — mirrors the reference's namespace."""

    def __getattr__(self, name: str) -> Semiring:
        try:
            return _REGISTRY[name]
        except KeyError:
            raise AttributeError(f"unknown semiring {name!r}") from None

    def __getitem__(self, name: str) -> Semiring:
        return _REGISTRY[name]

    def register(self, name: str, add: Monoid, mul, np_add=None, np_mul=None, identity=None) -> Semiring:
        """UDF-ish extension point (reference: ``Semiring.register_new``)."""
        return _register(name, add, mul, np_add, np_mul, identity)

    def names(self):
        return sorted(_REGISTRY)


semiring = _SemiringNamespace()

# --- the workhorse semirings (reference: GrB/GxB catalog) -------------------
_register("plus_times", monoid.plus, binary.times, np.add, np.multiply, 0)
_register("plus_plus", monoid.plus, binary.plus, np.add, np.add, 0)
_register("plus_first", monoid.plus, binary.first, np.add, _np_first, 0)
_register("plus_second", monoid.plus, binary.second, np.add, _np_second, 0)  # PageRank SpMV
_register("plus_pair", monoid.plus, binary.pair, np.add, _np_pair, 0)        # triangle count
_register("plus_min", monoid.plus, binary.min, np.add, np.minimum, 0)
_register("plus_max", monoid.plus, binary.max, np.add, np.maximum, 0)
_register("min_plus", monoid.min, binary.plus, np.minimum, np.add, np.inf)   # SSSP
_register("min_times", monoid.min, binary.times, np.minimum, np.multiply, np.inf)
_register("min_first", monoid.min, binary.first, np.minimum, _np_first, np.inf)  # parent BFS
_register("min_second", monoid.min, binary.second, np.minimum, _np_second, np.inf)  # FastSV hook
_register("min_max", monoid.min, binary.max, np.minimum, np.maximum, np.inf)
_register("max_plus", monoid.max, binary.plus, np.maximum, np.add, -np.inf)
_register("max_times", monoid.max, binary.times, np.maximum, np.multiply, -np.inf)
_register("max_first", monoid.max, binary.first, np.maximum, _np_first, -np.inf)
_register("max_second", monoid.max, binary.second, np.maximum, _np_second, -np.inf)
_register("max_min", monoid.max, binary.min, np.maximum, np.minimum, -np.inf)
_register("lor_land", monoid.lor, binary.land, np.logical_or, np.logical_and, False)  # level BFS
_register("land_lor", monoid.land, binary.lor, np.logical_and, np.logical_or, True)
_register("lxor_land", monoid.lxor, binary.land, np.logical_xor, np.logical_and, False)
_register("any_pair", monoid.any, binary.pair, np.maximum, _np_pair, None)   # reachability
_register("any_first", monoid.any, binary.first, np.maximum, _np_first, None)
_register("any_second", monoid.any, binary.second, np.maximum, _np_second, None)
_register("times_times", monoid.times, binary.times, np.multiply, np.multiply, 1)
_register("times_plus", monoid.times, binary.plus, np.multiply, np.add, 1)

# complex FC64 semiring (SURVEY §1.2 struct<re,im> mapping): DataFrame path
# only — the blocked/Arrow kernel path needs a flat numeric dtype, so the
# numpy twins stay None and kernels fall back to the exchange-based plan.
_register("plus_times_fc64", monoid.cplus, binary.ctimes, None, None, (0.0, 0.0))
# FC32 twin: identical algebra at complex64 width; the monoid casts its
# component sums back to float so FC32 storage survives mxm/reduce.
_register("plus_times_fc32", monoid.cplus_fc32, binary.ctimes, None, None,
          (0.0, 0.0))


class _NumpySemiringResolver:
    """``semiring.numpy.<monoid>_<binary>`` — the reference's numpy-named
    semiring cross product (graphblas/semiring/numpy.py), resolved against
    the numpy alias namespaces ON DEMAND: compositions are built lazily,
    cached, and NEVER registered into the builtin registry (so the
    registry-driven sweep keeps its closed catalog).  Parsing prefers the
    longest monoid prefix, mirroring the reference's name set where every
    member is <monoid-name>_<binary-name>."""

    def __init__(self):
        self._cache: dict[str, Semiring] = {}

    def __getattr__(self, name: str) -> Semiring:
        if name.startswith("_"):
            raise AttributeError(name)
        if name in self._cache:
            return self._cache[name]
        from graph_python_spark.functions.ops import binary as _b
        from graph_python_spark.functions.ops import monoid as _m

        for cut in range(len(name) - 1, 0, -1):
            if name[cut] != "_":
                continue
            mn, bn = name[:cut], name[cut + 1:]
            if mn in _m.numpy and bn in _b.numpy:
                sr = Semiring(f"numpy.{name}", _m.numpy[mn], _b.numpy[bn],
                              None, None, _m.numpy[mn].identity)
                self._cache[name] = sr
                return sr
        raise AttributeError(f"unknown numpy semiring {name!r}")

    def __getitem__(self, name: str) -> Semiring:
        return getattr(self, name)


semiring.numpy = _NumpySemiringResolver()
