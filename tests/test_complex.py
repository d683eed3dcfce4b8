"""FC64 complex dtype support (SURVEY §1.2: struct<re,im> value columns)
vs numpy complex128 oracles.  Reference: core/dtypes.py:13 (FC32/FC64,
backend-gated) and the GxB complex op catalog (CONJ/CREAL/CIMAG/CARG +
polymorphic plus/times/div)."""

import random

import numpy as np
import pytest

from graph_python_spark.functions.ops import binary, monoid, unary
from graph_python_spark.functions.semiring import semiring
from graph_python_spark.operators.matrix import MatrixFrame


def _cmat(spark, cells):
    """cells: {(i, j): complex}."""
    rows = [(int(i), int(j), (float(z.real), float(z.imag))) for (i, j), z in cells.items()]
    df = spark.createDataFrame(rows, "i long, j long, v struct<re: double, im: double>")
    return MatrixFrame(df)


def _to_dict(m):
    return {(r["i"], r["j"]): complex(r["v"]["re"], r["v"]["im"])
            for r in m.df.collect()}


def rand_cells(n=6, fill=0.6, seed=3):
    rng = random.Random(seed)
    return {(i, j): complex(round(rng.uniform(-2, 2), 3), round(rng.uniform(-2, 2), 3))
            for i in range(n) for j in range(n) if rng.random() < fill}


def _dense(cells, n=6):
    a = np.zeros((n, n), dtype=np.complex128)
    for (i, j), z in cells.items():
        a[i, j] = z
    return a


def test_complex_apply_unary(spark):
    cells = rand_cells()
    A = _cmat(spark, cells)
    conj = _to_dict(A.apply(unary.conj))
    assert conj == {k: z.conjugate() for k, z in cells.items()}
    cabs = {(r["i"], r["j"]): r["v"] for r in A.apply(unary.cabs).df.collect()}
    for k, z in cells.items():
        assert cabs[k] == pytest.approx(abs(z), rel=1e-12)
    carg = {(r["i"], r["j"]): r["v"] for r in A.apply(unary.carg).df.collect()}
    for k, z in cells.items():
        assert carg[k] == pytest.approx(np.angle(z), rel=1e-12)
    minv = _to_dict(A.apply(unary.cminv))
    for k, z in cells.items():
        assert minv[k] == pytest.approx(1.0 / z, rel=1e-12)


def test_complex_ewise(spark):
    ca, cb = rand_cells(seed=5), rand_cells(seed=11)
    A, B = _cmat(spark, ca), _cmat(spark, cb)
    prod = _to_dict(A.ewise_mult(B, binary.ctimes))
    want = {k: ca[k] * cb[k] for k in set(ca) & set(cb)}
    assert set(prod) == set(want)
    for k in want:
        assert prod[k] == pytest.approx(want[k], rel=1e-12)
    # union semantics: lone cells pass through unchanged
    tot = _to_dict(A.ewise_add(B, binary.cplus))
    for k in set(ca) | set(cb):
        assert tot[k] == pytest.approx(ca.get(k, 0) + cb.get(k, 0), rel=1e-12)
    quot = _to_dict(A.ewise_mult(B, binary.cdiv))
    for k in set(ca) & set(cb):
        assert quot[k] == pytest.approx(ca[k] / cb[k], rel=1e-12)


def test_complex_mxm_vs_numpy(spark):
    ca, cb = rand_cells(seed=7), rand_cells(seed=9)
    A, B = _cmat(spark, ca), _cmat(spark, cb)
    got = _to_dict(A.mxm(B, semiring.plus_times_fc64))
    want = _dense(ca) @ _dense(cb)
    # structural zeros: a computed cell exists iff some k has A[i,k], B[k,j]
    expect_keys = {(i, j) for (i, k1) in ca for (k2, j) in cb if k1 == k2}
    assert set(got) == expect_keys
    for (i, j), z in got.items():
        assert z == pytest.approx(want[i, j], abs=1e-9)


def test_complex_reduce(spark):
    cells = rand_cells(seed=13)
    A = _cmat(spark, cells)
    s = A.reduce_scalar(monoid.cplus)
    want = sum(cells.values())
    assert complex(s["re"], s["im"]) == pytest.approx(want, rel=1e-12)
    rows = {r["i"]: complex(r["v"]["re"], r["v"]["im"])
            for r in A.reduce_rowwise(monoid.cplus).df.collect()}
    for i in rows:
        assert rows[i] == pytest.approx(
            sum(z for (r, _), z in cells.items() if r == i), rel=1e-12)


def test_complex_transpose_conj(spark):
    """Hermitian adjoint = transpose + conj — the composition the reference
    writes as A.T.apply(conj)."""
    cells = rand_cells(seed=17)
    A = _cmat(spark, cells)
    adj = _to_dict(A.T.apply(unary.conj))
    assert adj == {(j, i): z.conjugate() for (i, j), z in cells.items()}
