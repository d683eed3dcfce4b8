"""Pickle round-trip for MatrixFrame/VectorFrame (reference
``Matrix.__reduce__`` / ``Vector.__reduce__``, matrix.py:257-273) — the
last migration-surface item: driver-side COO + shape + value dtype through
pickle, rebuilt on the active session."""

import pickle

import pytest

from graph_python_spark import MatrixFrame, VectorFrame


def test_matrix_pickle_roundtrip(spark):
    A = MatrixFrame.from_coo(spark, [0, 0, 2, 5], [1, 3, 2, 0],
                             [1.5, -2.0, 0.25, 7.0], 6, 6)
    B = pickle.loads(pickle.dumps(A))
    assert B.to_coo() == A.to_coo()
    assert (B.nrows, B.ncols) == (6, 6)
    assert B.df.schema["v"].dataType.simpleString() == "double"


def test_matrix_pickle_preserves_dtype(spark):
    A = MatrixFrame.from_coo(spark, [0, 1], [1, 0], [3, 4], 2, 2,
                             dtype="long")
    B = pickle.loads(pickle.dumps(A))
    assert B.df.schema["v"].dataType.simpleString() == "bigint"
    assert B.to_coo() == A.to_coo()


def test_vector_pickle_roundtrip(spark):
    v = VectorFrame.from_coo(spark, [0, 3, 5], [1.0, -0.5, 2.25], 8)
    w = pickle.loads(pickle.dumps(v))
    assert w.to_coo() == v.to_coo()
    assert w.size == 8


def test_pickle_of_computed_result(spark):
    from graph_python_spark import semiring

    A = MatrixFrame.from_coo(spark, [0, 1, 2], [1, 2, 0], [1.0, 1.0, 1.0],
                             3, 3)
    C = A.mxm(A, semiring.plus_times)
    D = pickle.loads(pickle.dumps(C))
    assert D.to_coo() == C.to_coo()
