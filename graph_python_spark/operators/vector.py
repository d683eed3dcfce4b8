"""VectorFrame — GraphBLAS Vector as a vertex DataFrame V(i: long, v: T).

Reference: ``graphblas/core/vector.py`` (Vector, 2251 LoC).  Missing entries
are ABSENT ROWS (structural sparsity), never SQL NULL.  All operations are
lazy DataFrame plans — the analogue of the reference's delayed expressions
(``core/base.py:515-561``): nothing executes until an action.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graph_python_spark.functions.ops import Monoid, binary as _binary
from graph_python_spark.functions.semiring import Semiring
from graph_python_spark.operators.masks import Mask
from graph_python_spark.operators.merge import merge_into


class VectorFrame:
    _keys = ["i"]

    def __init__(self, df: DataFrame, size: Optional[int] = None):
        assert set(df.columns) >= {"i", "v"}, df.columns
        self.df = df.select("i", "v")
        self._size = size

    # -- construction ------------------------------------------------------
    @classmethod
    def from_coo(
        cls,
        spark: SparkSession,
        indices: Iterable[int],
        values: Iterable[Any] | Any,
        size: Optional[int] = None,
        dup_op: Optional[Callable] = None,
        dtype: str = "double",
    ) -> "VectorFrame":
        """Reference: ``Vector.from_coo`` ``graphblas/core/vector.py:694+``."""
        idx = list(indices)
        vals = values if isinstance(values, (list, tuple)) else [values] * len(idx)
        coerce = float if dtype in ("double", "float") else (int if "int" in dtype or dtype == "long" else (lambda x: x))
        df = spark.createDataFrame(
            [(int(i), coerce(v)) for i, v in zip(idx, vals)], schema=f"i long, v {dtype}"
        )
        if dup_op is not None:
            df = df.groupBy("i").agg(dup_op(F.col("v")).alias("v"))
        elif len(set(idx)) != len(idx):
            raise ValueError("duplicate indices without dup_op")
        return cls(df, size)

    @classmethod
    def dense(cls, spark: SparkSession, size: int, value: Any, dtype: str = "double") -> "VectorFrame":
        """v[:] = scalar over the full extent (GrB_assign scalar fill)."""
        df = spark.range(size).select(
            F.col("id").alias("i"), F.lit(value).cast(dtype).alias("v")
        )
        return cls(df, size)

    # -- metadata ----------------------------------------------------------
    @property
    def size(self) -> int:
        if self._size is None:
            row = self.df.agg(F.max("i")).first()
            self._size = (row[0] + 1) if row[0] is not None else 0
        return self._size

    @property
    def nvals(self) -> int:
        return self.df.count()

    @property
    def S(self) -> Mask:
        return Mask(self, structural=True)

    @property
    def V(self) -> Mask:
        return Mask(self, structural=False)

    def dup(self) -> "VectorFrame":
        return VectorFrame(self.df, self._size)

    # -- element-wise (reference vector.py:1012-1258) -----------------------
    def ewise_mult(self, other: "VectorFrame", op: Callable = _binary.times) -> "VectorFrame":
        """Intersection of structures == inner join on i."""
        a = self.df.withColumnRenamed("v", "_va")
        b = other.df.withColumnRenamed("v", "_vb")
        out = a.join(b, "i").select("i", op(F.col("_va"), F.col("_vb")).alias("v"))
        return VectorFrame(out, self._size)

    def ewise_add(self, other: "VectorFrame", op: Callable = _binary.plus) -> "VectorFrame":
        """Union of structures; lone values pass through == full outer join."""
        a = self.df.withColumnRenamed("v", "_va")
        b = other.df.withColumnRenamed("v", "_vb")
        both = F.col("_va").isNotNull() & F.col("_vb").isNotNull()
        merged = (
            F.when(both, op(F.col("_va"), F.col("_vb")))
            .when(F.col("_va").isNotNull(), F.col("_va"))
            .otherwise(F.col("_vb"))
        )
        out = a.join(b, "i", "full_outer").select("i", merged.alias("v"))
        return VectorFrame(out, self._size)

    def ewise_union(
        self, other: "VectorFrame", op: Callable, left_default: Any, right_default: Any
    ) -> "VectorFrame":
        """Union with explicit defaults (reference vector.py:1141-1258)."""
        a = self.df.withColumnRenamed("v", "_va")
        b = other.df.withColumnRenamed("v", "_vb")
        out = a.join(b, "i", "full_outer").select(
            "i",
            op(
                F.coalesce(F.col("_va"), F.lit(left_default)),
                F.coalesce(F.col("_vb"), F.lit(right_default)),
            ).alias("v"),
        )
        return VectorFrame(out, self._size)

    # -- apply / select (vector.py:1308-1560) --------------------------------
    def apply(self, op: Callable, right: Any = None, left: Any = None) -> "VectorFrame":
        if left is not None:
            expr = op(F.lit(left), F.col("v"))
        elif right is not None:
            expr = op(F.col("v"), F.lit(right))
        else:
            expr = op(F.col("v"))
        return VectorFrame(self.df.select("i", expr.alias("v")), self._size)

    def select(self, pred: Callable | Column) -> "VectorFrame":
        cond = pred(F.col("v"), F.col("i")) if callable(pred) else pred
        return VectorFrame(self.df.filter(cond), self._size)

    # -- reduce (vector.py:1561-1608) ----------------------------------------
    def reduce(self, op: Monoid) -> Any:
        row = self.df.agg(op.agg(F.col("v")).alias("v")).first()
        return row["v"]

    # -- linear algebra ------------------------------------------------------
    def vxm(self, A: "Any", op: Semiring) -> "VectorFrame":
        """v' = vᵀ·A  (frontier push; reference vector.py:1259-1307).

        Spark shape: join frontier on edge source, ⊕-aggregate by dest.
        """
        e = A.df.select(F.col("i").alias("_ei"), F.col("j").alias("_ej"), F.col("v").alias("_ev"))
        joined = self.df.join(e, self.df["i"] == e["_ei"])
        out = (
            joined.select(F.col("_ej").alias("i"), op.mul(F.col("v"), F.col("_ev")).alias("_m"))
            .groupBy("i")
            .agg(op.add_agg(F.col("_m")).alias("v"))
        )
        return VectorFrame(out, A._ncols)

    def inner(self, other: "VectorFrame", op: Semiring) -> Any:
        """v·w -> scalar (reference vector.py:1609-1651)."""
        a = self.df.withColumnRenamed("v", "_va")
        b = other.df.withColumnRenamed("v", "_vb")
        row = (
            a.join(b, "i")
            .select(op.mul(F.col("_va"), F.col("_vb")).alias("_m"))
            .agg(op.add_agg(F.col("_m")).alias("v"))
            .first()
        )
        return row["v"]

    def outer(self, other: "VectorFrame", op: Callable = _binary.times) -> "Any":
        """v⊗w -> Matrix (reference vector.py:1653-1694)."""
        from graph_python_spark.operators.matrix import MatrixFrame

        a = self.df.select(F.col("i"), F.col("v").alias("_va"))
        b = other.df.select(F.col("i").alias("j"), F.col("v").alias("_vb"))
        out = a.crossJoin(b).select("i", "j", op(F.col("_va"), F.col("_vb")).alias("v"))
        return MatrixFrame(out, self._size, other._size)

    def diag(self, k: int = 0) -> "Any":
        """Vector -> diagonal Matrix (reference vector.py:620-643)."""
        from graph_python_spark.operators.matrix import MatrixFrame

        out = self.df.select(
            F.col("i"), (F.col("i") + F.lit(k)).alias("j"), F.col("v")
        )
        n = None if self._size is None else self._size + abs(k)
        return MatrixFrame(out, n, n)

    # -- extract / assign (EP3) ----------------------------------------------
    def extract(self, indices: Sequence[int], reindex: bool = True) -> "VectorFrame":
        """w = v[indices]; output densely reindexed (reference expr.py:100-258)."""
        spark = self.df.sparkSession
        imap = spark.createDataFrame(
            [(int(old), new) for new, old in enumerate(indices)], "i long, _new long"
        )
        out = self.df.join(F.broadcast(imap), "i").select(F.col("_new").alias("i"), "v")
        if not reindex:
            out = self.df.join(F.broadcast(imap.select("i")), "i", "left_semi")
        return VectorFrame(out, len(indices))

    def get(self, i: int, default: Any = None) -> Any:
        row = self.df.filter(F.col("i") == i).first()
        return default if row is None else row["v"]

    def update(
        self,
        delta: "VectorFrame",
        mask: Optional[Mask] = None,
        accum: Optional[Callable] = None,
        replace: bool = False,
    ) -> "VectorFrame":
        """C(mask, accum, replace) << delta — the Updater (base.py:318-494)."""
        out = merge_into(self.df, delta.df, self._keys, mask, accum, replace)
        return VectorFrame(out, self._size)

    def assign_scalar(self, value: Any, mask: Optional[Mask] = None,
                      accum: Optional[Callable] = None, size: Optional[int] = None) -> "VectorFrame":
        """v(mask, accum)[:] = scalar  (dense fill over the full extent)."""
        n = size or self.size
        dense = VectorFrame.dense(self.df.sparkSession, n, value,
                                  dtype=self.df.schema["v"].dataType.simpleString())
        return self.update(dense, mask=mask, accum=accum)

    # -- ss extensions ---------------------------------------------------------
    def selectk(self, k: int, how: str = "smallest") -> "VectorFrame":
        """Keep k entries (reference ss/vector.py:1407-1455)."""
        order = {
            "smallest": [F.col("v").asc(), F.col("i").asc()],
            "largest": [F.col("v").desc(), F.col("i").asc()],
            "first": [F.col("i").asc()],
            "last": [F.col("i").desc()],
        }[how]
        w = Window.orderBy(*order)
        out = (
            self.df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
        return VectorFrame(out, self._size)

    def sort(self, ascending: bool = True) -> "VectorFrame":
        """ss.sort: values re-indexed by sort rank (reference
        ss/vector.py:1562-1622)."""
        order = [F.col("v").asc(), F.col("i").asc()] if ascending else [F.col("v").desc(), F.col("i").asc()]
        w = Window.orderBy(*order)
        out = self.df.select((F.row_number().over(w) - 1).alias("i"), "v")
        return VectorFrame(out, self._size)

    def compactify(self, how: str = "first") -> "VectorFrame":
        """ss.compactify: squeeze stored values left (reference
        ss/vector.py:1456-1561)."""
        order = {
            "first": [F.col("i").asc()],
            "last": [F.col("i").desc()],
            "smallest": [F.col("v").asc(), F.col("i").asc()],
            "largest": [F.col("v").desc(), F.col("i").asc()],
        }[how]
        w = Window.orderBy(*order)
        out = self.df.select((F.row_number().over(w) - 1).alias("i"), "v")
        return VectorFrame(out, self._size)

    def reposition(self, offset: int) -> "VectorFrame":
        """Shift indices (reference vector.py:1695-1762); out-of-bounds drop."""
        n = self.size
        out = (
            self.df.select((F.col("i") + offset).alias("i"), "v")
            .filter((F.col("i") >= 0) & (F.col("i") < n))
        )
        return VectorFrame(out, n)

    def reduce_agg(self, aggfn) -> Any:
        """Whole-vector reduction with an Aggregator (reference
        agg/__init__.py catalog — mean, std, norms, ...)."""
        return self.df.agg(aggfn(F.col("v")).alias("v")).first()["v"]

    def argmin(self) -> Optional[int]:
        """ss argmin: index of the smallest value (ties -> smallest index)."""
        row = self.df.agg(F.min_by(F.col("i"), F.struct(F.col("v"), F.col("i"))).alias("i")).first()
        return row["i"]

    def argmax(self) -> Optional[int]:
        row = self.df.agg(
            F.max_by(F.col("i"), F.struct(F.col("v"), -F.col("i"))).alias("i")
        ).first()
        return row["i"]

    def scan(self, op: Monoid = None) -> "VectorFrame":
        """Prefix scan (reference core/ss/prefix_scan.py:12-183) — Spark
        windows replace the whole blocked up/down-sweep recipe."""
        from graph_python_spark.functions.ops import monoid as _monoid

        op = op or _monoid.plus
        w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        out = self.df.select("i", op.agg(F.col("v")).over(w).alias("v"))
        return VectorFrame(out, self._size)

    # -- comparison (test oracle surface; matrix.py:357-444) -------------------
    def isequal(self, other: "VectorFrame") -> bool:
        a = self.df.withColumnRenamed("v", "_va")
        b = other.df.withColumnRenamed("v", "_vb")
        j = a.join(b, "i", "full_outer")
        bad = j.filter(
            F.col("_va").isNull()
            | F.col("_vb").isNull()
            | (F.col("_va") != F.col("_vb"))
        )
        return bad.limit(1).count() == 0

    def isclose(self, other: "VectorFrame", rel_tol: float = 1e-7, abs_tol: float = 0.0) -> bool:
        a = self.df.withColumnRenamed("v", "_va")
        b = other.df.withColumnRenamed("v", "_vb")
        j = a.join(b, "i", "full_outer")
        close = F.abs(F.col("_va") - F.col("_vb")) <= (
            F.lit(abs_tol) + F.lit(rel_tol) * F.abs(F.col("_vb"))
        )
        bad = j.filter(F.col("_va").isNull() | F.col("_vb").isNull() | ~close)
        return bad.limit(1).count() == 0

    def to_coo(self) -> tuple[list[int], list[Any]]:
        rows = self.df.orderBy("i").collect()
        return [r["i"] for r in rows], [r["v"] for r in rows]

    def to_dict(self) -> dict[int, Any]:
        return {r["i"]: r["v"] for r in self.df.collect()}
