"""Public Arrow interchange (to_arrow / from_arrow) — the Spark-honest
analogue of the reference's ss export/import raw-buffer surface
(reference core/ss/matrix.py:538-3663): round-trips preserve values,
value dtype (incl. FC64 struct<re,im> and UDT struct values), and the
logical shape via schema metadata."""

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from graph_python_spark import MatrixFrame, VectorFrame


def test_matrix_roundtrip_double(spark):
    m = MatrixFrame.from_coo(spark, [0, 1, 2], [1, 2, 0], [1.5, -2.0, 3.25],
                             nrows=5, ncols=4)
    tbl = m.to_arrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.num_rows == 3
    back = MatrixFrame.from_arrow(spark, tbl)
    assert (back.nrows, back.ncols) == (5, 4)
    assert back.to_coo() == m.to_coo()


def test_vector_roundtrip_long(spark):
    v = VectorFrame.from_coo(spark, [0, 3, 7], [10, 20, 30], size=9,
                             dtype="long")
    tbl = v.to_arrow()
    back = VectorFrame.from_arrow(spark, tbl)
    assert back.size == 9
    assert back.to_coo() == v.to_coo()
    assert dict(back.df.dtypes)["v"] == "bigint"


def test_matrix_roundtrip_fc64(spark):
    # FC64 maps to struct<re: double, im: double> (functions/dtypes.py)
    df = spark.createDataFrame(
        [(0, 0, (1.0, -2.0)), (1, 1, (0.5, 3.0))],
        "i long, j long, v struct<re: double, im: double>")
    m = MatrixFrame(df, 2, 2)
    tbl = m.to_arrow()
    assert pa.types.is_struct(tbl.schema.field("v").type)
    back = MatrixFrame.from_arrow(spark, tbl, nrows=2, ncols=2)
    got = {(r, c): (val["re"], val["im"])
           for r, c, val in zip(*back.to_coo())}
    assert got == {(0, 0): (1.0, -2.0), (1, 1): (0.5, 3.0)}


def test_matrix_roundtrip_udt_struct(spark):
    # a UDT-style value: struct with mixed field types
    df = spark.createDataFrame(
        [(0, 1, (3, 1.5)), (2, 0, (-4, 0.25))],
        "i long, j long, v struct<x: long, y: double>")
    m = MatrixFrame(df, 3, 3)
    back = MatrixFrame.from_arrow(spark, m.to_arrow())
    assert (back.nrows, back.ncols) == (3, 3)
    got = sorted((r, c, (val["x"], val["y"]))
                 for r, c, val in zip(*back.to_coo()))
    assert got == [(0, 1, (3, 1.5)), (2, 0, (-4, 0.25))]


def test_from_arrow_external_table(spark):
    # a table built directly in pyarrow (no prior export) ingests too,
    # and explicit shape overrides absent metadata
    tbl = pa.table({"i": pa.array([0, 1], pa.int64()),
                    "j": pa.array([1, 0], pa.int64()),
                    "v": pa.array([1.0, 2.0], pa.float64())})
    m = MatrixFrame.from_arrow(spark, tbl, nrows=10, ncols=10)
    assert (m.nrows, m.ncols) == (10, 10)
    assert m.df.count() == 2


def test_arrow_empty_matrix(spark):
    m = MatrixFrame(spark.createDataFrame([], "i long, j long, v double"),
                    4, 4)
    tbl = m.to_arrow()
    assert tbl.num_rows == 0
    back = MatrixFrame.from_arrow(spark, tbl)
    assert (back.nrows, back.ncols) == (4, 4)
    assert back.df.count() == 0


def test_to_arrow_max_rows_guard(spark):
    m = MatrixFrame.from_coo(spark, [0, 1, 2], [1, 2, 0], [1.0, 2.0, 3.0],
                             nrows=3, ncols=3)
    with pytest.raises(ValueError, match="max_rows=2"):
        m.to_arrow(max_rows=2)
    assert m.to_arrow(max_rows=3).num_rows == 3
    v = VectorFrame.from_coo(spark, [0, 1], [1.0, 2.0], size=4)
    with pytest.raises(ValueError, match="max_rows=1"):
        v.to_arrow(max_rows=1)
    assert v.to_arrow(max_rows=10).num_rows == 2
