"""Property-based differential tests (hypothesis): random sparse operands
vs pure-Python oracles for the ewise family and the merge_into write
combinator — the reference's semantics stated set-theoretically and checked
on arbitrary inputs, not just fixtures.

Examples are kept small and few: each case round-trips through Spark, so
the value is in input *shape* diversity (disjoint/overlapping supports,
empty operands, masks covering none/all), not volume.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graph_python_spark import MatrixFrame
from graph_python_spark.functions.ops import binary
from graph_python_spark.operators.masks import Mask
from graph_python_spark.operators.merge import merge_into

CELLS = st.dictionaries(
    st.tuples(st.integers(0, 4), st.integers(0, 4)),
    st.integers(-9, 9),
    max_size=8,
)

_SETTINGS = dict(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _mf(spark, cells):
    if not cells:
        return MatrixFrame(
            spark.createDataFrame([], "i long, j long, v long"), 5, 5)
    rows = [(i, j, v) for (i, j), v in cells.items()]
    return MatrixFrame(
        spark.createDataFrame(rows, "i long, j long, v long"), 5, 5)


def _collect(m):
    return {(r["i"], r["j"]): r["v"] for r in m.df.collect()}


@given(a=CELLS, b=CELLS)
@settings(**_SETTINGS)
def test_ewise_add_union_semantics(spark, a, b):
    got = _collect(_mf(spark, a).ewise_add(_mf(spark, b), binary.plus))
    want = {k: a.get(k, 0) + b.get(k, 0) for k in set(a) | set(b)}
    assert got == want


@given(a=CELLS, b=CELLS)
@settings(**_SETTINGS)
def test_ewise_mult_intersection_semantics(spark, a, b):
    got = _collect(_mf(spark, a).ewise_mult(_mf(spark, b), binary.times))
    want = {k: a[k] * b[k] for k in set(a) & set(b)}
    assert got == want


@given(a=CELLS, b=CELLS)
@settings(**_SETTINGS)
def test_ewise_union_defaults(spark, a, b):
    got = _collect(_mf(spark, a).ewise_union(_mf(spark, b), binary.minus,
                                             left_default=3, right_default=5))
    want = {k: a.get(k, 3) - b.get(k, 5) for k in set(a) | set(b)}
    assert got == want


@given(old=CELLS, delta=CELLS, mcells=CELLS,
       complement=st.booleans(), replace=st.booleans(),
       with_accum=st.booleans())
@settings(**_SETTINGS)
def test_merge_into_mask_accum_replace(spark, old, delta, mcells,
                                       complement, replace, with_accum):
    """C(mask, accum, replace) << delta against the GraphBLAS update rule
    (merge.py module docstring):
        Z = accum ? union-merge(C, T) : T
        M true  -> C = Z (present iff Z present)
        M false -> replace ? deleted : old C kept
    """
    mask = Mask(_mf(spark, mcells), structural=True, complement=complement)
    out = merge_into(
        _mf(spark, old).df, _mf(spark, delta).df, ["i", "j"],
        mask=mask, accum=binary.plus if with_accum else None, replace=replace,
    )
    got = {(r["i"], r["j"]): r["v"] for r in out.collect()}

    universe = {(i, j) for i in range(5) for j in range(5)}
    allowed = (universe - set(mcells)) if complement else set(mcells)
    delta_in = {k: v for k, v in delta.items() if k in allowed}
    old_in = {k: v for k, v in old.items() if k in allowed}
    if with_accum:
        inside = {k: (old_in[k] + delta_in[k]
                      if k in old_in and k in delta_in
                      else old_in.get(k, delta_in.get(k)))
                  for k in set(old_in) | set(delta_in)}
    else:
        inside = dict(delta_in)
    outside = {k: v for k, v in old.items() if k not in allowed}
    want = inside if replace else {**outside, **inside}
    assert got == want


FLOATS = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)


@given(a=FLOATS, b=FLOATS,
       rel=st.floats(min_value=0, max_value=0.5),
       abs_tol=st.floats(min_value=0, max_value=10.0))
@settings(**_SETTINGS)
def test_isclose_symmetric_property(spark, a, b, rel, abs_tol):
    """binary.isclose equals math.isclose (the reference formula) and is
    SYMMETRIC in its arguments for arbitrary finite inputs and tolerances
    — the property numpy's asymmetric form violates."""
    import math

    from graph_python_spark.functions.ops import binary as B

    df = spark.createDataFrame([(a, b), (b, a)], "x double, y double")
    op = B.isclose(rel, abs_tol)
    got = [r[0] for r in df.select(op(F.col("x"), F.col("y"))).collect()]
    want = math.isclose(a, b, rel_tol=rel, abs_tol=abs_tol)
    assert got == [want, want]


@given(fields=st.dictionaries(
    st.sampled_from(["a", "b", "c", "d"]),
    st.sampled_from(["int8", "int32", "int64", "float32", "float64", "bool"]),
    min_size=1, max_size=4))
@settings(max_examples=20, deadline=None)
def test_udt_registration_roundtrip(fields):
    """register_anonymous is idempotent per layout: repeated registration
    of the same structured dtype returns the same (deterministic) name,
    and the Spark storage string reflects every field in order."""
    import numpy as np

    from graph_python_spark.functions import dtypes as dt

    npdt = np.dtype([(k, v) for k, v in fields.items()])
    n1 = dt.register_anonymous(npdt)
    n2 = dt.register_anonymous(npdt)
    assert n1 == n2
    st_type = dt.spark_type(n1)
    assert st_type.startswith("struct<")
    for fname in fields:
        assert f"{fname}: " in st_type
