"""Per-operator unit tests: engine vs NumPy oracle on the reference's own
A7/v7 fixtures (reference test strategy: SURVEY.md §5)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_python_spark import MatrixFrame, VectorFrame, semiring
from graph_python_spark.functions.ops import binary, monoid, indexunary
from graph_python_spark.oracles import dense as O
from tests.fixtures import A7_COLS, A7_N, A7_ROWS, A7_VALS, V7_IDX, V7_N, V7_VALS


@pytest.fixture(scope="module")
def A(spark):
    return MatrixFrame.from_coo(spark, A7_ROWS, A7_COLS, A7_VALS, A7_N, A7_N, dtype="long")


@pytest.fixture(scope="module")
def v(spark):
    return VectorFrame.from_coo(spark, V7_IDX, V7_VALS, V7_N, dtype="long")


@pytest.fixture(scope="module")
def oA():
    return O.SparseArray.from_coo(A7_ROWS, A7_COLS, A7_VALS, (A7_N, A7_N))


@pytest.fixture(scope="module")
def ov():
    return O.SparseArray.vector_from_coo(V7_IDX, V7_VALS, V7_N)


def mat_dict(m: MatrixFrame):
    return {(i, j): v for i, j, v in zip(*m.to_coo())}


def vec_dict(v: VectorFrame):
    i, vals = v.to_coo()
    return dict(zip(i, vals))


def test_nvals_shape(A, v):
    assert A.nvals == 12
    assert A.nrows == 7 and A.ncols == 7
    assert v.nvals == 4 and v.size == 7


def test_transpose(A, oA):
    got = mat_dict(A.T)
    want = {(j, i): val for (i, j), val in oA.to_dict().items()}
    assert got == want


def test_ewise_mult_intersection(A, oA):
    got = mat_dict(A.ewise_mult(A.T, binary.plus))
    want = O.ewise_mult(oA, O.SparseArray(oA.values.T, oA.present.T), np.add).to_dict()
    assert got == want


def test_ewise_add_union(A, oA):
    got = mat_dict(A.ewise_add(A.T, binary.plus))
    want = O.ewise_add(oA, O.SparseArray(oA.values.T, oA.present.T), np.add).to_dict()
    assert got == want


def test_ewise_union_defaults(A, oA):
    got = mat_dict(A.ewise_union(A.T, binary.minus, 10, 20))
    want = O.ewise_union(
        oA, O.SparseArray(oA.values.T, oA.present.T), np.subtract, 10, 20
    ).to_dict()
    assert got == want


def test_vector_ewise(v, ov):
    doubled = VectorFrame(v.df.select("i", (F.col("v") * 2).alias("v")), V7_N)
    got = vec_dict(v.ewise_add(doubled, binary.plus))
    want = {i: 3 * val for i, val in ov.to_dict().items()}
    assert got == want
    got = vec_dict(v.ewise_mult(doubled, binary.min))
    want = {i: min(val, 2 * val) for i, val in ov.to_dict().items()}
    assert got == want


def test_apply(A, oA):
    got = mat_dict(A.apply(lambda c: c * c))
    want = {k: val * val for k, val in oA.to_dict().items()}
    assert got == want
    # binary apply with bound scalar: A.apply(binary.minus, right=1)
    got = mat_dict(A.apply(binary.minus, right=1))
    want = {k: val - 1 for k, val in oA.to_dict().items()}
    assert got == want


def test_apply_indexunary(A, oA):
    got = mat_dict(A.apply_indexunary(indexunary.rowindex))
    want = {(i, j): i for (i, j) in oA.to_dict()}
    assert got == want


def test_select_value_and_position(A, oA):
    got = mat_dict(A.select(indexunary.valuegt, 3))
    want = {k: val for k, val in oA.to_dict().items() if val > 3}
    assert got == want
    got = mat_dict(A.select(indexunary.triu, 1))  # j >= i+1 strict upper
    want = {(i, j): val for (i, j), val in oA.to_dict().items() if j >= i + 1}
    assert got == want


def test_reduce(A, oA, v, ov):
    got = vec_dict(A.reduce_rowwise(monoid.plus))
    want = O.reduce_rowwise(oA, np.add).to_dict()
    assert got == want
    got = vec_dict(A.reduce_columnwise(monoid.max))
    want = O.reduce_columnwise(oA, np.maximum).to_dict()
    assert got == want
    assert A.reduce_scalar(monoid.plus) == sum(A7_VALS)
    assert v.reduce(monoid.min) == 0


def test_mxv_plus_times(A, v, oA, ov):
    got = vec_dict(A.mxv(v, semiring.plus_times))
    want = O.mxv(oA, ov, np.add, np.multiply).to_dict()
    assert got == want


def test_mxv_min_plus(A, v, oA, ov):
    got = vec_dict(A.mxv(v, semiring.min_plus))
    want = O.mxv(oA, ov, np.minimum, np.add).to_dict()
    assert got == want


def test_vxm(A, v, oA, ov):
    got = vec_dict(v.vxm(A, semiring.plus_times))
    want = O.mxv(O.SparseArray(oA.values.T, oA.present.T), ov, np.add, np.multiply).to_dict()
    assert got == want


def test_mxm_semirings(A, oA):
    for sr, add, mul in [
        (semiring.plus_times, np.add, np.multiply),
        (semiring.min_plus, np.minimum, np.add),
        (semiring.plus_pair, np.add, lambda a, b: np.ones_like(np.broadcast_arrays(a, b)[0])),
        (semiring.max_second, np.maximum, lambda a, b: np.broadcast_arrays(a, b)[1]),
    ]:
        got = mat_dict(A.mxm(A.T, sr))
        oT = O.SparseArray(oA.values.T, oA.present.T)
        want = O.mxm(oA, oT, add, mul).to_dict()
        assert got == want, sr.name


def test_mxm_masked(A, oA):
    mask = A.S
    got = mat_dict(A.mxm_masked(A.T, semiring.plus_times, mask))
    oT = O.SparseArray(oA.values.T, oA.present.T)
    full = O.mxm(oA, oT, np.add, np.multiply).to_dict()
    want = {k: val for k, val in full.items() if k in oA.to_dict()}
    assert got == want
    # complemented mask
    got = mat_dict(A.mxm_masked(A.T, semiring.plus_times, ~mask))
    want = {k: val for k, val in full.items() if k not in oA.to_dict()}
    assert got == want


def test_inner_outer(v, ov, spark):
    assert v.inner(v, semiring.plus_times) == sum(x * x for x in V7_VALS)
    got = mat_dict(v.outer(v, binary.times))
    want = {
        (a, b): ov.to_dict()[a] * ov.to_dict()[b]
        for a in ov.to_dict()
        for b in ov.to_dict()
    }
    assert got == want


def test_kronecker(spark):
    A = MatrixFrame.from_coo(spark, [0, 1], [1, 0], [2, 3], 2, 2, dtype="long")
    B = MatrixFrame.from_coo(spark, [0, 0], [0, 1], [5, 7], 1, 2, dtype="long")
    got = mat_dict(A.kronecker(B, binary.times))
    want = {(0, 2): 10, (0, 3): 14, (1, 0): 15, (1, 1): 21}
    assert got == want


def test_power(spark):
    # path graph 0->1->2->3: A^2 reaches two hops
    A = MatrixFrame.from_coo(spark, [0, 1, 2], [1, 2, 3], [1, 1, 1], 4, 4, dtype="long")
    got = mat_dict(A.power(2, semiring.plus_times))
    assert got == {(0, 2): 1, (1, 3): 1}
    got = mat_dict(A.power(3, semiring.plus_times))
    assert got == {(0, 3): 1}


def test_diag_reposition(A, oA):
    d = vec_dict(A.diag(1))
    want = {i: val for (i, j), val in oA.to_dict().items() if j == i + 1}
    assert d == want
    got = mat_dict(A.reposition(1, 1))
    want = {
        (i + 1, j + 1): val
        for (i, j), val in oA.to_dict().items()
        if i + 1 < A7_N and j + 1 < A7_N
    }
    assert got == want


def test_extract(A, oA):
    rows, cols = [0, 3, 6], [1, 2, 3, 4]
    got = mat_dict(A.extract(rows, cols))
    want = {}
    for (i, j), val in oA.to_dict().items():
        if i in rows and j in cols:
            want[(rows.index(i), cols.index(j))] = val
    assert got == want
    assert A.element(3, 0) == 3
    assert A.element(0, 0, default=None) is None


def test_update_assign_merge(A, oA, spark):
    delta = MatrixFrame.from_coo(spark, [0, 0], [1, 0], [100, 50], A7_N, A7_N, dtype="long")
    # C << Z without accum/mask: Z replaces C entirely (GraphBLAS update rule)
    out = mat_dict(A.update(delta))
    assert out == {(0, 1): 100, (0, 0): 50}
    # upsert = accum=binary.second: delta wins where both, passthrough else
    out = mat_dict(A.update(delta, accum=binary.second))
    assert out[(0, 1)] == 100 and out[(0, 0)] == 50 and out[(3, 0)] == 3
    # accum: merged via op where both present, inserted where new
    out = mat_dict(A.update(delta, accum=binary.plus))
    assert out[(0, 1)] == 102 and out[(0, 0)] == 50 and out[(3, 0)] == 3
    # mask: write Z through A's structure; old entries at mask-true positions
    # not present in Z are deleted, outside-mask entries kept (none here)
    out = mat_dict(A.update(delta, mask=A.S))
    assert out == {(0, 1): 100}
    # mask + accum keeps old inside mask, merges delta
    out = mat_dict(A.update(delta, mask=A.S, accum=binary.plus))
    assert out[(0, 1)] == 102 and out[(3, 0)] == 3 and (0, 0) not in out
    # complemented mask + replace: only mask-true delta entries survive
    out = mat_dict(A.update(delta, mask=~A.S, replace=True))
    assert out == {(0, 0): 50}
    # complemented mask without replace: outside-mask old entries survive
    out = mat_dict(A.update(delta, mask=~A.S))
    assert out == {**oA.to_dict(), (0, 0): 50}


def test_vector_assign_scalar(v):
    out = vec_dict(v.assign_scalar(9, size=V7_N))
    assert out == {i: 9 for i in range(V7_N)}
    out = vec_dict(v.assign_scalar(9, mask=v.S, size=V7_N))
    assert out == {i: 9 for i in V7_IDX}


def test_isequal_isclose(A, spark):
    assert A.isequal(A.dup())
    B = A.apply(binary.plus, right=1)
    assert not A.isequal(B)
    Af = A.apply(lambda c: c.cast("double"))
    Bf = Af.apply(lambda c: c * (1 + 1e-9))
    assert Af.isclose(Bf, rel_tol=1e-7)
    assert not Af.isclose(Bf, rel_tol=1e-12)


def test_sort_selectk_compactify_scan(A, oA):
    got = mat_dict(A.selectk_rowwise(1, "largest"))
    d = oA.to_dict()
    want = {}
    for i in set(k[0] for k in d):
        row = [(j, val) for (r, j), val in d.items() if r == i]
        j, val = max(row, key=lambda t: (t[1], -t[0]))
        want[(i, j)] = val
    assert got == want
    # scan: cumulative sum along each row in j order
    got = mat_dict(A.scan_rowwise())
    csum = {}
    for i in sorted(set(k[0] for k in d)):
        acc = 0
        for j in sorted(j for (r, j) in d if r == i):
            acc += d[(i, j)]
            csum[(i, j)] = acc
    assert got == csum
    # compactify: values squeezed left preserving j order
    got = mat_dict(A.compactify_rowwise("first"))
    want = {}
    for i in sorted(set(k[0] for k in d)):
        for new_j, j in enumerate(sorted(j for (r, j) in d if r == i)):
            want[(i, new_j)] = d[(i, j)]
    assert got == want


def test_flatten_reshape(A, oA, spark):
    flat = A.flatten()
    assert vec_dict(flat) == {i * A7_N + j: val for (i, j), val in oA.to_dict().items()}
    back = MatrixFrame.reshape_from_vector(flat, A7_N, A7_N)
    assert mat_dict(back) == oA.to_dict()


def test_concat_split(A, oA, spark):
    from graph_python_spark.operators.matrix import concat, split

    tiles = split(A, [3, 4], [3, 4])
    back = concat(tiles)
    assert mat_dict(back) == oA.to_dict()


def test_dup_op_build(spark):
    m = MatrixFrame.from_coo(
        spark, [0, 0, 1], [1, 1, 0], [1, 2, 5], 2, 2, dup_op=F.sum, dtype="long"
    )
    assert mat_dict(m) == {(0, 1): 3, (1, 0): 5}


def test_frame_isclose_symmetric_formula(spark):
    """MatrixFrame.isclose / VectorFrame.isclose share binary.isclose's
    symmetric reference formula (review r5): with rel_tol=0.05 the pair
    (100, 95) is close under max(|a|,|b|) scaling — numpy's asymmetric
    form would reject it in this argument order."""
    from graph_python_spark.operators.vector import VectorFrame

    A = MatrixFrame.from_coo(spark, [0], [0], [100.0], 1, 1)
    B = MatrixFrame.from_coo(spark, [0], [0], [95.0], 1, 1)
    assert A.isclose(B, rel_tol=0.05)
    assert B.isclose(A, rel_tol=0.05)
    assert not A.isclose(B, rel_tol=0.01)
    va = VectorFrame.from_coo(spark, [0], [100.0], size=1)
    vb = VectorFrame.from_coo(spark, [0], [95.0], size=1)
    assert va.isclose(vb, rel_tol=0.05) and not va.isclose(vb, rel_tol=0.01)
