"""GraphBLAS dtype lattice mapped onto Spark SQL storage types.

Reference surface: ``graphblas/core/dtypes.py`` — builtins BOOL,
INT8/16/32/64, UINT8/16/32/64, FP32, FP64 and the backend-gated complex
FC32/FC64 (``dtypes.py:13``); ``lookup_dtype`` (``dtypes.py:352-376``)
resolves names/numpy dtypes/python types; ``unify`` (``dtypes.py:377-396``)
promotes mixed operands with numpy rules (the reference literally calls
``np.promote_types``), e.g. INT64 ⊕ FP32 → FP64, UINT64 ⊕ INT64 → FP64,
FP64 ⊗ FC32 → FC64.

Spark mapping (SURVEY §1.2): signed ints → tinyint/smallint/int/long;
UNSIGNED ints have no Spark storage, so each is WIDENED to the next signed
type that contains its range (uint64 → long with values ≥ 2^63 declared
unsupported — same caveat as the _INDEX mapping); FP32/FP64 → float/double;
FC32/FC64 → struct<re,im> with float/double fields.  Promotion itself is
computed in dtype-name space with numpy (bit-exact with the reference);
storage is only the landing type.

Spark's OWN binary-arithmetic coercion mostly agrees with this lattice
(Spark 4 lands long + float on double) but is an engine implementation
detail; mixed-dtype kernels cast through ``promote_columns`` so the
landing type is the lattice's by construction, not by coincidence — the
dtype-matrix test pins the full table.
"""

from __future__ import annotations

from typing import Union

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# name -> (numpy dtype for promotion math, Spark storage type)
DTYPES: dict[str, tuple[np.dtype, str]] = {
    "BOOL": (np.dtype(np.bool_), "boolean"),
    "INT8": (np.dtype(np.int8), "tinyint"),
    "INT16": (np.dtype(np.int16), "smallint"),
    "INT32": (np.dtype(np.int32), "int"),
    "INT64": (np.dtype(np.int64), "long"),
    "UINT8": (np.dtype(np.uint8), "smallint"),
    "UINT16": (np.dtype(np.uint16), "int"),
    "UINT32": (np.dtype(np.uint32), "long"),
    "UINT64": (np.dtype(np.uint64), "long"),  # >= 2^63 unsupported
    "FP32": (np.dtype(np.float32), "float"),
    "FP64": (np.dtype(np.float64), "double"),
    "FC32": (np.dtype(np.complex64), "struct<re: float, im: float>"),
    "FC64": (np.dtype(np.complex128), "struct<re: double, im: double>"),
}

_BY_NP = {npdt: name for name, (npdt, _) in DTYPES.items()}

_ALIASES = {
    "bool": "BOOL", "boolean": "BOOL",
    "int8": "INT8", "tinyint": "INT8",
    "int16": "INT16", "smallint": "INT16",
    "int32": "INT32", "int": "INT32",
    "int64": "INT64", "long": "INT64", "bigint": "INT64",
    "uint8": "UINT8", "uint16": "UINT16",
    "uint32": "UINT32", "uint64": "UINT64",
    "fp32": "FP32", "float32": "FP32", "float": "FP32",
    "fp64": "FP64", "float64": "FP64", "double": "FP64",
    "fc32": "FC32", "complex64": "FC32",
    "fc64": "FC64", "complex128": "FC64",
}


_BUILTINS = frozenset(DTYPES)


def _np_to_spark(npdt: np.dtype) -> str:
    """Spark storage type for a numpy dtype, recursively: sub-array
    dtypes land on array<...>, structured dtypes on struct<...>, scalar
    dtypes on their lattice storage type."""
    if npdt.subdtype is not None:
        base, shape = npdt.subdtype
        inner = _np_to_spark(base)
        for _ in shape:
            inner = f"array<{inner}>"
        return inner
    if npdt.fields:
        parts = ", ".join(f"{fn}: {_np_to_spark(fd[0])}"
                          for fn, fd in npdt.fields.items())
        return f"struct<{parts}>"
    if npdt.hasobject:
        raise ValueError("dtype must not allow Python objects")
    if npdt in _BY_NP:
        return DTYPES[_BY_NP[npdt]][1]
    raise ValueError(f"no Spark storage type for numpy dtype {npdt}")


def _default_name(npdt: np.dtype) -> str:
    # deterministic across processes (hash() is PYTHONHASHSEED-salted;
    # a checkpointed/persisted name must resolve after a driver restart)
    import hashlib

    return "udt_" + hashlib.md5(str(npdt).encode()).hexdigest()[:10]


def _check_name_available(name: str) -> None:
    if name in DTYPES or name.lower() in _ALIASES:
        raise ValueError(f"{name!r} name for dtype is unavailable")


def register_anonymous(dtype, name: str | None = None) -> str:
    """Register a user-defined (numpy-structured) dtype and return its
    canonical name — reference ``register_anonymous``
    (core/dtypes.py:87-151).  Accepts a numpy structured dtype, a dict
    convenience form ``{"x": int, "y": float}``, or a sub-array string
    form ``"INT64[3, 4]"``.  The Spark storage type is the recursive
    struct/array mapping of the numpy layout (SURVEY §1.2: struct values
    ride in a struct<> value column end-to-end — ewise, mxm with
    first/second-style ops, select, assign all already operate on struct
    columns), so registration is a lattice entry, not codegen."""
    try:
        npdt = np.dtype(dtype)
    except TypeError:
        if isinstance(dtype, dict):
            npdt = np.dtype(
                [(key, DTYPES[lookup_dtype(val)][0])
                 for key, val in dtype.items()], align=True)
        elif isinstance(dtype, str) and "[" in dtype and dtype.endswith("]"):
            base, shape = dtype.split("[", 1)
            base_np = DTYPES[lookup_dtype(base)][0]
            shape = tuple(int(s) for s in shape[:-1].replace(" ", "").split(",") if s)
            npdt = np.dtype((base_np, shape))
        else:
            raise
    if npdt.hasobject:
        raise ValueError("dtype must not allow Python objects")
    if npdt in _BY_NP:
        existing = _BY_NP[npdt]
        if name is not None and existing != name:
            if existing in _BUILTINS:
                raise ValueError("dtype must not be a builtin type")
            _check_name_available(name)
            # rename an existing UDT entry (reference keeps one object
            # per layout and adopts the latest name)
            DTYPES[name] = DTYPES.pop(existing)
            _BY_NP[npdt] = name
            return name
        return existing
    if name is None:
        name = _default_name(npdt)
    # generated names go through the same availability check as
    # caller-supplied ones — a collision must raise, never overwrite
    _check_name_available(name)
    DTYPES[name] = (npdt, _np_to_spark(npdt))
    _BY_NP[npdt] = name
    return name


def register_new(name: str, dtype) -> str:
    """Register a NAMED user-defined dtype — reference ``register_new``
    (core/dtypes.py:76-85): the name must be a fresh Python identifier;
    afterwards ``lookup_dtype(name)``/``spark_type(name)`` resolve it."""
    if not name.isidentifier():
        raise ValueError(
            f"`name` argument must be a valid Python identifier; got: {name!r}")
    if name in DTYPES or name.lower() in _ALIASES:
        raise ValueError(f"{name!r} name for dtype is unavailable")
    return register_anonymous(dtype, name)


def lookup_dtype(x: Union[str, type, np.dtype]) -> str:
    """Resolve a dtype spec (canonical name, Spark/numpy type string,
    python type, numpy dtype) to the canonical GraphBLAS name — reference
    ``lookup_dtype`` (core/dtypes.py:352-376)."""
    if isinstance(x, str):
        key = x.strip()
        if key in DTYPES:
            return key
        low = key.lower()
        if low in _ALIASES:
            return _ALIASES[low]
        raise ValueError(f"unknown dtype {x!r}")
    if x is bool:
        return "BOOL"
    if x is int:
        return "INT64"
    if x is float:
        return "FP64"
    if x is complex:
        return "FC64"
    npdt = np.dtype(x)
    if npdt in _BY_NP:
        return _BY_NP[npdt]
    raise ValueError(f"unknown dtype {x!r}")


def unify(a: Union[str, type, np.dtype], b: Union[str, type, np.dtype]) -> str:
    """Promotion of mixed operand dtypes — reference ``unify``
    (core/dtypes.py:377-396), which defers to numpy's promote_types."""
    na, nb = lookup_dtype(a), lookup_dtype(b)
    out = np.promote_types(DTYPES[na][0], DTYPES[nb][0])
    if out in _BY_NP:
        return _BY_NP[out]
    raise ValueError(f"no GraphBLAS dtype for promotion {na} x {nb} -> {out}")


def spark_type(name: Union[str, type, np.dtype]) -> str:
    """Spark storage type for a dtype."""
    return DTYPES[lookup_dtype(name)][1]


def cast_to(col: Column, from_dtype: str, to_dtype: str) -> Column:
    """Cast a value Column between dtypes' Spark storage types.  Real →
    complex embeds as {re: x, im: 0}; complex → complex is a field-wise
    struct cast (FC32 ↔ FC64 width change); complex → real is undefined
    in the reference and raises."""
    src, dst = lookup_dtype(from_dtype), lookup_dtype(to_dtype)
    if src == dst:
        return col
    if src not in _BUILTINS or dst not in _BUILTINS:
        raise ValueError(f"no implicit cast between UDTs: {src} -> {dst}")
    st = DTYPES[dst][1]
    dst_cplx = dst in ("FC32", "FC64")
    src_cplx = src in ("FC32", "FC64")
    if dst_cplx:
        field = "float" if dst == "FC32" else "double"
        if src_cplx:
            return F.struct(col["re"].cast(field).alias("re"),
                            col["im"].cast(field).alias("im"))
        return F.struct(col.cast(field).alias("re"),
                        F.lit(0.0).cast(field).alias("im"))
    if src_cplx:
        raise ValueError(f"no implicit {src} -> {dst} demotion")
    return col.cast(st)


def promote_columns(a: Column, b: Column, a_dtype: str, b_dtype: str
                    ) -> tuple[Column, Column, str]:
    """Cast both operands to their unified dtype BEFORE a binary op, so
    mixed-dtype kernels follow the reference lattice instead of Spark's
    own coercion (which lands long + float on float, not double)."""
    out = unify(a_dtype, b_dtype)
    return cast_to(a, a_dtype, out), cast_to(b, b_dtype, out), out
