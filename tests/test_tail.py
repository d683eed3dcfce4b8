"""§2 tail operators: input_mask extract, sort permutation, CSR/dict
construction & export, selectk random, positional aggregators.

Reference parity targets:
  input_mask extract      — graphblas/core/expr.py:333-377
  sort permutation        — graphblas/core/ss/matrix.py:3991-4056
  from/to csr,csc,dcsr,dcsc — graphblas/core/matrix.py:1136-1397, 1704-1853
  from_dicts/to_dicts     — graphblas/core/matrix.py:1577-1901
  selectk 'random'        — graphblas/core/ss/matrix.py:3815-3876
  first/last aggregators  — graphblas/agg/__init__.py:1-75
"""

import numpy as np
import pytest

from graph_python_spark import MatrixFrame, VectorFrame
from graph_python_spark.functions.ops import agg
from graph_python_spark.operators.masks import Mask

ROWS = [0, 0, 0, 1, 2, 2, 3]
COLS = [1, 3, 4, 2, 0, 4, 3]
VALS = [5.0, 2.0, 7.0, 1.0, 9.0, 4.0, 6.0]


@pytest.fixture(scope="module")
def A(spark):
    return MatrixFrame.from_coo(spark, ROWS, COLS, VALS, 4, 5)


def test_input_mask_extract(spark, A):
    m = MatrixFrame.from_coo(spark, [0, 0, 2], [1, 3, 0], [1.0, 1.0, 1.0], 4, 5)
    got = A.extract(rows=[0, 2], cols=[0, 1, 3], input_mask=Mask(m)).df.collect()
    cells = {(r["i"], r["j"]): r["v"] for r in got}
    # masked input keeps (0,1)=5, (0,3)=2, (2,0)=9; reindexed rows [0,2]->0,1
    # and cols [0,1,3]->0,1,2
    assert cells == {(0, 1): 5.0, (0, 2): 2.0, (1, 0): 9.0}
    inv = A.extract(rows=[0, 2], cols=[0, 1, 3], input_mask=~Mask(m)).df.collect()
    assert {(r["i"], r["j"]): r["v"] for r in inv} == {}


def test_sort_rowwise_permutation(A):
    vals, perm = A.sort_rowwise(permutation=True)
    v = {(r["i"], r["j"]): r["v"] for r in vals.df.collect()}
    p = {(r["i"], r["j"]): r["v"] for r in perm.df.collect()}
    # row 0 values sorted: 2.0(j=3), 5.0(j=1), 7.0(j=4)
    assert [v[(0, k)] for k in range(3)] == [2.0, 5.0, 7.0]
    assert [p[(0, k)] for k in range(3)] == [3, 1, 4]
    # applying the permutation reproduces the original row
    orig = {(i, j): val for i, j, val in zip(ROWS, COLS, VALS)}
    for (i, k), j in p.items():
        assert orig[(i, j)] == v[(i, k)]


def test_vector_sort_permutation(spark):
    v = VectorFrame.from_coo(spark, [2, 5, 9, 11], [4.0, 1.0, 3.0, 1.5], 12)
    vals, perm = v.sort(permutation=True)
    assert [r["v"] for r in vals.df.orderBy("i").collect()] == [1.0, 1.5, 3.0, 4.0]
    assert [r["v"] for r in perm.df.orderBy("i").collect()] == [5, 11, 9, 2]


def test_selectk_random_deterministic(A, spark):
    got1 = A.selectk_rowwise(2, how="random", seed=7).df.collect()
    got2 = A.selectk_rowwise(2, how="random", seed=7).df.collect()
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))
    per_row = {}
    orig = {(i, j): val for i, j, val in zip(ROWS, COLS, VALS)}
    for r in got1:
        per_row.setdefault(r["i"], []).append(r)
        assert orig[(r["i"], r["j"])] == r["v"]
    assert all(len(v) <= 2 for v in per_row.values())
    assert len(per_row[0]) == 2
    v = VectorFrame.from_coo(spark, [1, 4, 6, 8], [9.0, 8.0, 7.0, 6.0], 10)
    rnd = v.selectk(2, how="random", seed=3).df.collect()
    assert len(rnd) == 2 and {r["i"] for r in rnd} <= {1, 4, 6, 8}


def test_csr_roundtrip(spark, A):
    indptr, cols, vals = A.to_csr()
    assert list(indptr) == [0, 3, 4, 6, 7]
    back = MatrixFrame.from_csr(spark, indptr, cols, vals, ncols=5)
    assert back.to_dicts() == A.to_dicts()


def test_csc_roundtrip(spark, A):
    indptr, rows, vals = A.to_csc()
    assert len(indptr) == 6
    back = MatrixFrame.from_csc(spark, indptr, rows, vals, nrows=4)
    assert back.to_dicts() == A.to_dicts()


def test_dcsr_dcsc_roundtrip(spark):
    # hypersparse: rows 1 and 7 present out of a big extent
    m = MatrixFrame.from_coo(spark, [1, 1, 7], [0, 9, 4], [1.0, 2.0, 3.0], 100, 10)
    crows, indptr, cols, vals = m.to_dcsr()
    assert list(crows) == [1, 7] and list(indptr) == [0, 2, 3]
    back = MatrixFrame.from_dcsr(spark, crows, indptr, cols, vals, nrows=100, ncols=10)
    assert back.to_dicts() == m.to_dicts()
    ccols, indptr2, rows2, vals2 = m.to_dcsc()
    back2 = MatrixFrame.from_dcsc(spark, ccols, indptr2, rows2, vals2, nrows=100, ncols=10)
    assert back2.to_dicts() == m.to_dicts()


def test_from_to_dicts(spark, A):
    d = A.to_dicts()
    assert d == {0: {1: 5.0, 3: 2.0, 4: 7.0}, 1: {2: 1.0}, 2: {0: 9.0, 4: 4.0}, 3: {3: 6.0}}
    assert MatrixFrame.from_dicts(spark, d).to_dicts() == d
    colwise = A.to_dicts(order="columnwise")
    assert MatrixFrame.from_dicts(spark, colwise, order="columnwise").to_dicts() == d
    lst = [{1: 5.0}, {}, {0: 2.0}]
    m = MatrixFrame.from_dicts(spark, lst)
    assert m.to_dicts() == {0: {1: 5.0}, 2: {0: 2.0}}
    assert m.nrows == 3


def test_positional_aggregators(spark, A):
    first = {r["i"]: r["v"] for r in A.reduce_rowwise_agg(agg.first).df.collect()}
    assert first == {0: 5.0, 1: 1.0, 2: 9.0, 3: 6.0}          # value at min j
    last = {r["i"]: r["v"] for r in A.reduce_rowwise_agg(agg.last).df.collect()}
    assert last == {0: 7.0, 1: 1.0, 2: 4.0, 3: 6.0}           # value at max j
    fi = {r["i"]: r["v"] for r in A.reduce_rowwise_agg(agg.first_index).df.collect()}
    assert fi == {0: 1, 1: 2, 2: 0, 3: 3}
    li = {r["i"]: r["v"] for r in A.reduce_columnwise_agg(agg.last_index).df.collect()}
    assert li == {0: 2, 1: 0, 2: 1, 3: 3, 4: 2}               # max i per column
    v = VectorFrame.from_coo(spark, [3, 6, 9], [5.0, 2.0, 8.0], 10)
    assert v.reduce_agg(agg.first) == 5.0
    assert v.reduce_agg(agg.last) == 8.0
    assert v.reduce_agg(agg.first_index) == 3
    assert v.reduce_agg(agg.last_index) == 9
    with pytest.raises(TypeError):
        agg.first(None)


def test_struct_valued_cells(spark):
    """Complex dtypes (reference core/dtypes.py:76-151 UDTs) map to
    StructType value columns: ops take/return struct columns via
    user-supplied lambdas — exercised through ewise_mult, apply and
    transpose."""
    from pyspark.sql import functions as F

    rows = [(0, 1, (1.0, 2.0)), (1, 0, (3.0, -1.0)), (1, 2, (0.5, 4.0))]
    df = spark.createDataFrame(
        rows, "i long, j long, v struct<re: double, im: double>"
    )
    m = MatrixFrame(df, 3, 3)

    # apply: complex conjugate
    conj = m.apply(lambda v: F.struct(v["re"].alias("re"), (-v["im"]).alias("im")))
    got = {(r["i"], r["j"]): (r["v"]["re"], r["v"]["im"]) for r in conj.df.collect()}
    assert got[(0, 1)] == (1.0, -2.0) and got[(1, 2)] == (0.5, -4.0)

    # ewise_mult with a complex-product lambda against the transpose view
    prod = m.ewise_mult(m.T, lambda a, b: F.struct(
        (a["re"] * b["re"] - a["im"] * b["im"]).alias("re"),
        (a["re"] * b["im"] + a["im"] * b["re"]).alias("im"),
    ))
    got = {(r["i"], r["j"]): (r["v"]["re"], r["v"]["im"]) for r in prod.df.collect()}
    # (0,1): (1+2i)*(3-1i) = 5 + 5i ; (1,0): (3-1i)*(1+2i) = 5 + 5i
    assert got == {(0, 1): (5.0, 5.0), (1, 0): (5.0, 5.0)}


def test_ewise_union_vector(spark):
    """_m_union_v parity (reference matrix.py:82-89): union with defaults
    over the dense row extent."""
    m = MatrixFrame.from_coo(spark, [0, 1], [0, 1], [10.0, 20.0], 2, 3)
    v = VectorFrame.from_coo(spark, [1, 2], [1.0, 2.0], 3)
    out = {(r["i"], r["j"]): r["v"]
           for r in m.ewise_union_vector(v, left_default=0.0,
                                         right_default=0.0).df.collect()}
    # temp covers rows {0,1} x cols {1,2}; minus with defaults
    assert out == {
        (0, 0): 10.0,            # matrix-only: 10 - 0
        (0, 1): -1.0,            # vector-only: 0 - 1
        (0, 2): -2.0,
        (1, 1): 19.0,            # both: 20 - 1
        (1, 2): -2.0,
    }


def test_bit_position_ops(spark, A):
    """bget/bset/bclr/bshift (reference binary catalog) over stored values."""
    from graph_python_spark.functions.ops import binary

    m = MatrixFrame.from_coo(spark, [0, 0, 1], [0, 1, 0], [5, 12, 7], 2, 2,
                             dtype="long")
    def vals(mm):
        return {(r["i"], r["j"]): r["v"] for r in mm.df.collect()}

    assert vals(m.apply(binary.bget, right=2)) == {(0, 0): 1, (0, 1): 1, (1, 0): 1}
    assert vals(m.apply(binary.bset, right=1)) == {(0, 0): 7, (0, 1): 14, (1, 0): 7}
    assert vals(m.apply(binary.bclr, right=2)) == {(0, 0): 1, (0, 1): 8, (1, 0): 3}
    assert vals(m.apply(binary.bshift, right=2)) == {(0, 0): 20, (0, 1): 48, (1, 0): 28}
    assert vals(m.apply(binary.bshift, right=-1)) == {(0, 0): 2, (0, 1): 6, (1, 0): 3}


def test_transcendental_unary_ops(spark):
    """erf/erfc/lgamma/tgamma/frexp — the C-scalar-kernel unaries Spark SQL
    lacks, via Arrow-batched pandas UDFs (reference unary catalog)."""
    import math

    from graph_python_spark.functions.ops import unary

    m = MatrixFrame.from_coo(spark, [0, 0, 1], [0, 1, 0], [0.5, 1.5, 3.0], 2, 2)
    for name, ref in [("erf", math.erf), ("erfc", math.erfc),
                      ("lgamma", math.lgamma), ("tgamma", math.gamma)]:
        got = {(r["i"], r["j"]): r["v"]
               for r in m.apply(unary[name]).df.collect()}
        for (i, j), v in {(0, 0): 0.5, (0, 1): 1.5, (1, 0): 3.0}.items():
            assert abs(got[(i, j)] - ref(v)) < 1e-12, name
    mant = {(r["i"], r["j"]): r["v"] for r in m.apply(unary.frexpx).df.collect()}
    expo = {(r["i"], r["j"]): r["v"] for r in m.apply(unary.frexpe).df.collect()}
    for (i, j), v in {(0, 0): 0.5, (0, 1): 1.5, (1, 0): 3.0}.items():
        wm, we = math.frexp(v)
        assert mant[(i, j)] == wm and expo[(i, j)] == we


def test_array_valued_cells(spark):
    """Array UDTs (reference HPEC2022.ipynb 'Array UDT' demo: fixed-size
    vector cells) map to ArrayType value columns: elementwise lambdas use
    zip_with / transform, reductions aggregate inside the cell."""
    from pyspark.sql import functions as F

    rows = [(0, 1, [1.0, 2.0, 3.0]), (1, 0, [0.5, 0.5, 0.5]),
            (1, 2, [-1.0, 0.0, 1.0])]
    df = spark.createDataFrame(rows, "i long, j long, v array<double>")
    m = MatrixFrame(df, 3, 3)

    # apply: scale every component (transform keeps it JVM-side)
    scaled = m.apply(lambda v: F.transform(v, lambda x: x * 2.0))
    got = {(r["i"], r["j"]): r["v"] for r in scaled.df.collect()}
    assert got[(0, 1)] == [2.0, 4.0, 6.0] and got[(1, 2)] == [-2.0, 0.0, 2.0]

    # ewise_mult against the transpose view with a per-cell dot product
    # (zip_with + aggregate): array cells in, scalar cells out
    dot = m.ewise_mult(m.T, lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x))
    got = {(r["i"], r["j"]): r["v"] for r in dot.df.collect()}
    # (0,1)·(1,0): 1*0.5 + 2*0.5 + 3*0.5 = 3.0 (and symmetric)
    assert got == {(0, 1): 3.0, (1, 0): 3.0}

    # reduce inside the cell: per-entry L1 norm via apply, then row sum
    from graph_python_spark.functions.ops import monoid

    l1 = m.apply(lambda v: F.aggregate(v, F.lit(0.0),
                                       lambda acc, x: acc + F.abs(x)))
    rowsum = {r["i"]: r["v"] for r in
              l1.reduce_rowwise(monoid.plus).df.collect()}
    assert rowsum == {0: 6.0, 1: 3.5}


def test_positional_unary_ops(spark):
    """Reference unary.positioni/positionj (+1 variants) via indexunary."""
    from graph_python_spark.functions.ops import indexunary
    from graph_python_spark.operators.matrix import MatrixFrame

    m = MatrixFrame.from_coo(spark, [1, 2], [4, 0], [9.0, 3.0], nrows=5, ncols=5)
    got = {(r["i"], r["j"]): r["v"]
           for r in m.apply_indexunary(indexunary.positioni1).df.collect()}
    assert got == {(1, 4): 2, (2, 0): 3}
    got = {(r["i"], r["j"]): r["v"]
           for r in m.apply_indexunary(indexunary.positionj).df.collect()}
    assert got == {(1, 4): 4, (2, 0): 0}
