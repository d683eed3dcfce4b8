"""Dtype-promotion matrix + FC32 support (reference analogue:
``tests/test_operator_types.py`` — assert the dtype→dtype table for the op
registry; ``core/dtypes.py:377-396`` unify).

Pins three facts:
  1. ``unify`` reproduces the reference lattice (numpy promote_types) over
     the FULL 13×13 dtype matrix — symmetric, idempotent, and equal to the
     reference's own spot values.
  2. ``promote_columns`` makes the lattice explicit in the plan, so
     kernels don't depend on the engine's own coercion table (Spark 4
     agrees on long+float→double but not on every integer row).
  3. FC32 (struct<re: float, im: float>) works through apply/ewise/mxm
     with complex64-level accuracy, and FC32 ⊕ FC64 promotes to FC64.
"""

from __future__ import annotations

import cmath

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_python_spark.functions import dtypes as dt
from graph_python_spark.functions.ops import binary, monoid, unary
from graph_python_spark.functions.semiring import semiring
from graph_python_spark.operators.matrix import MatrixFrame

ALL = list(dt.DTYPES)


def test_unify_matrix_matches_numpy():
    for a in ALL:
        for b in ALL:
            got = dt.unify(a, b)
            want_np = np.promote_types(dt.DTYPES[a][0], dt.DTYPES[b][0])
            assert dt.DTYPES[got][0] == want_np, (a, b, got, want_np)
            # symmetry + idempotence
            assert got == dt.unify(b, a)
            assert dt.unify(got, got) == got


def test_unify_reference_spot_values():
    # the table rows the reference's own tests pin
    assert dt.unify("BOOL", "BOOL") == "BOOL"
    assert dt.unify("BOOL", "INT8") == "INT8"
    assert dt.unify("INT8", "UINT8") == "INT16"
    assert dt.unify("INT32", "UINT32") == "INT64"
    assert dt.unify("UINT64", "INT64") == "FP64"   # numpy's famous row
    assert dt.unify("INT64", "FP32") == "FP64"
    assert dt.unify("FP32", "FP32") == "FP32"
    assert dt.unify("FP32", "FP64") == "FP64"
    assert dt.unify("FP32", "FC32") == "FC32"
    assert dt.unify("FP64", "FC32") == "FC64"
    assert dt.unify("FC32", "FC32") == "FC32"
    assert dt.unify("FC32", "FC64") == "FC64"


def test_lookup_dtype_aliases():
    assert dt.lookup_dtype("double") == "FP64"
    assert dt.lookup_dtype("long") == "INT64"
    assert dt.lookup_dtype(float) == "FP64"
    assert dt.lookup_dtype(int) == "INT64"
    assert dt.lookup_dtype(bool) == "BOOL"
    assert dt.lookup_dtype(complex) == "FC64"
    assert dt.lookup_dtype(np.float32) == "FP32"
    assert dt.lookup_dtype(np.complex64) == "FC32"
    with pytest.raises(ValueError):
        dt.lookup_dtype("decimal(10,2)")


def test_promote_columns_restores_lattice_exactly(spark):
    # 2^53 + 1 is exactly representable in float64 but not float32: the
    # value that separates int64+float32=FP64 (the reference lattice) from
    # a float32 landing.  Spark 4's own coercion happens to agree here
    # (long + float -> double); promote_columns makes the lattice explicit
    # so kernels don't depend on the engine's coercion table.
    big = (1 << 53) + 1
    df = spark.createDataFrame([(big, 0.0)], "a long, b double") \
        .select("a", F.col("b").cast("float").alias("b"))

    a2, b2, out = dt.promote_columns(F.col("a"), F.col("b"), "INT64", "FP32")
    assert out == "FP64"
    promoted = df.select(binary.plus(a2, b2).alias("r"))
    assert promoted.schema["r"].dataType.simpleString() == "double"
    assert promoted.collect()[0]["r"] == float(big)  # exact in FP64

    # a combo where Spark's native coercion does NOT follow numpy:
    # tinyint + tinyint stays tinyint in numpy (int8) — Spark widens some
    # integer ops; promote_columns pins the numpy landing type explicitly
    d2 = spark.createDataFrame([(3, 4)], "x int, y int") \
        .select(F.col("x").cast("tinyint").alias("x"),
                F.col("y").cast("tinyint").alias("y"))
    xa, xb, out8 = dt.promote_columns(F.col("x"), F.col("y"), "INT8", "INT8")
    assert out8 == "INT8"
    r8 = d2.select(binary.plus(xa, xb).cast(dt.spark_type(out8)).alias("r"))
    assert r8.schema["r"].dataType.simpleString() == "tinyint"
    assert r8.collect()[0]["r"] == 7


@pytest.mark.parametrize("a,b,want_spark", [
    ("INT64", "INT64", "bigint"),
    ("INT16", "INT32", "int"),
    ("FP32", "FP32", "float"),
    ("INT64", "FP32", "double"),
    ("FP64", "FC32", "struct<re:double,im:double>"),
    ("FC32", "FC32", "struct<re:float,im:float>"),
])
def test_promoted_landing_types(spark, a, b, want_spark):
    df = spark.createDataFrame(
        [(1.0, 1.0)], "x double, y double")
    xa = dt.cast_to(F.col("x"), "FP64", a) if a not in ("FC32", "FC64") \
        else dt.cast_to(F.col("x"), "FP64", a)
    xb = dt.cast_to(F.col("y"), "FP64", b)
    ca, cb, out = dt.promote_columns(xa, xb, a, b)
    op = binary.cplus if out in ("FC32", "FC64") else binary.plus
    r = df.select(op(ca, cb).alias("r"))
    assert r.schema["r"].dataType.simpleString() == want_spark, out


def _fc32_mat(spark, cells):
    rows = [(int(i), int(j), (float(z.real), float(z.imag)))
            for (i, j), z in cells.items()]
    df = spark.createDataFrame(rows, "i long, j long, "
                               "v struct<re: float, im: float>")
    return MatrixFrame(df)


def _to_cdict(m):
    return {(r["i"], r["j"]): complex(r["v"]["re"], r["v"]["im"])
            for r in m.df.collect()}


def test_fc32_apply_ewise_mxm(spark):
    import random

    rng = random.Random(41)
    ca = {(i, j): complex(round(rng.uniform(-2, 2), 3),
                          round(rng.uniform(-2, 2), 3))
          for i in range(5) for j in range(5) if rng.random() < 0.6}
    cb = {(i, j): complex(round(rng.uniform(-2, 2), 3),
                          round(rng.uniform(-2, 2), 3))
          for i in range(5) for j in range(5) if rng.random() < 0.6}
    A, B = _fc32_mat(spark, ca), _fc32_mat(spark, cb)

    # apply: conj keeps FC32 storage and complex64 accuracy
    conj = A.apply(unary.conj)
    assert conj.df.schema["v"].dataType.simpleString() == \
        "struct<re:float,im:float>"
    got = _to_cdict(conj)
    for k, z in ca.items():
        zc = complex(np.complex64(z).conjugate())
        assert cmath.isclose(got[k], zc, rel_tol=1e-6, abs_tol=1e-6)

    # ewise intersection product vs complex64 numpy
    prod = _to_cdict(A.ewise_mult(B, binary.ctimes))
    for k in set(ca) & set(cb):
        want = complex(np.complex64(ca[k]) * np.complex64(cb[k]))
        assert cmath.isclose(prod[k], want, rel_tol=1e-5, abs_tol=1e-5)
    assert set(prod) == set(ca) & set(cb)

    # mxm over the complex plus_times semiring vs a complex64 oracle
    got = _to_cdict(A.mxm(B, semiring.plus_times_fc64))
    groups: dict = {}
    for (i, k), av in ca.items():
        for (k2, j), bv in cb.items():
            if k == k2:
                groups.setdefault((i, j), []).append(
                    np.complex64(av) * np.complex64(bv))
    assert set(got) == set(groups)
    for key, parts in groups.items():
        want = complex(np.sum(np.array(parts, dtype=np.complex64)))
        assert cmath.isclose(got[key], want, rel_tol=1e-4, abs_tol=1e-4), key


def test_fc32_fc64_promotion_through_ewise(spark):
    za, zb = 1.5 + 2.25j, -0.5 + 1.0j
    a32 = _fc32_mat(spark, {(0, 0): za})
    df64 = spark.createDataFrame(
        [(0, 0, (zb.real, zb.imag))],
        "i long, j long, v struct<re: double, im: double>")
    b64 = MatrixFrame(df64)
    v32 = dt.cast_to(F.col("v"), "FC32", "FC64")
    a_prom = MatrixFrame(a32.df.select("i", "j", v32.alias("v")),
                         a32.nrows, a32.ncols)
    out = a_prom.ewise_mult(b64, binary.ctimes)
    assert out.df.schema["v"].dataType.simpleString() == \
        "struct<re:double,im:double>"
    got = _to_cdict(out)[(0, 0)]
    want = complex(np.complex128(np.complex64(za)) * zb)
    assert cmath.isclose(got, want, rel_tol=1e-6)


def test_register_new_structured_udt(spark):
    """register_new/register_anonymous (reference core/dtypes.py:76-151):
    a numpy-structured dtype becomes a lattice entry whose Spark storage
    type is the recursive struct mapping, and struct values flow through
    ewise ops end-to-end on that storage type."""
    name = dt.register_new("PointXY", {"x": int, "y": float})
    assert name == "PointXY"
    assert dt.lookup_dtype("PointXY") == "PointXY"
    st = dt.spark_type("PointXY")
    assert st == "struct<x: long, y: double>"
    # numpy-dtype lookup resolves to the registered name
    npdt = dt.DTYPES["PointXY"][0]
    assert dt.lookup_dtype(npdt) == "PointXY"
    # same layout registered anonymously returns the existing entry
    assert dt.register_anonymous(npdt) == "PointXY"
    # end-to-end: struct values through ewise_mult(second)
    df = spark.createDataFrame(
        [(0, 0, (1, 1.5)), (0, 1, (2, -0.5))], f"i long, j long, v {st}")
    m = MatrixFrame(df, 2, 2)
    out = m.ewise_mult(m, binary.second)
    rows = {(r["i"], r["j"]): (r["v"]["x"], r["v"]["y"])
            for r in out.df.collect()}
    assert rows == {(0, 0): (1, 1.5), (0, 1): (2, -0.5)}


def test_register_anonymous_subarray_and_errors():
    name = dt.register_anonymous("INT64[3, 4]")
    assert dt.spark_type(name) == "array<array<long>>"
    # builtins can't be renamed; taken names are rejected; objects rejected
    with pytest.raises(ValueError, match="builtin"):
        dt.register_anonymous(np.int64, "my_int")
    with pytest.raises(ValueError, match="unavailable"):
        dt.register_new("FP64", {"x": int})
    with pytest.raises(ValueError, match="identifier"):
        dt.register_new("not an identifier", {"x": int})
    with pytest.raises(ValueError, match="Python objects"):
        dt.register_anonymous(np.dtype([("o", object)]))
    # no implicit casts between UDTs
    pt = dt.register_anonymous(np.dtype([("a", np.int32)]), "PtA")
    with pytest.raises(ValueError, match="no implicit cast"):
        dt.cast_to(F.lit(0), pt, "FP64")


def test_fc32_semiring_preserves_storage(spark):
    """plus_times_fc32 keeps struct<re: float, im: float> storage through
    mxm (Spark's SUM over float widens to double; the FC32 monoid casts
    the component sums back), with complex64-level accuracy."""
    import random

    rng = random.Random(7)
    ca = {(i, j): complex(round(rng.uniform(-2, 2), 3),
                          round(rng.uniform(-2, 2), 3))
          for i in range(4) for j in range(4) if rng.random() < 0.7}
    cb = {(i, j): complex(round(rng.uniform(-2, 2), 3),
                          round(rng.uniform(-2, 2), 3))
          for i in range(4) for j in range(4) if rng.random() < 0.7}
    A, B = _fc32_mat(spark, ca), _fc32_mat(spark, cb)
    out = A.mxm(B, semiring.plus_times_fc32)
    assert out.df.schema["v"].dataType.simpleString() == \
        "struct<re:float,im:float>"
    got = _to_cdict(out)
    groups: dict = {}
    for (i, k), av in ca.items():
        for (k2, j), bv in cb.items():
            if k == k2:
                groups.setdefault((i, j), []).append(
                    np.complex64(av) * np.complex64(bv))
    assert set(got) == set(groups)
    for key, parts in groups.items():
        want = complex(np.complex64(np.sum(np.array(parts, dtype=np.complex64))))
        assert cmath.isclose(got[key], want, rel_tol=1e-4, abs_tol=1e-4), key
    # constructor keeps float fields too
    one = spark.range(1).select(
        binary.cmplx32(F.lit(1.25), F.lit(-0.5)).alias("v"))
    assert one.schema["v"].dataType.simpleString() == "struct<re:float,im:float>"
