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
    @staticmethod
    def _order(how: str, seed: int = 0):
        """'random' = deterministic seeded-hash shuffle (stand-in for the
        reference's RNG mode, reproducible across engines)."""
        return {
            "smallest": [F.col("v").asc(), F.col("i").asc()],
            "largest": [F.col("v").desc(), F.col("i").asc()],
            "first": [F.col("i").asc()],
            "last": [F.col("i").desc()],
            "random": [F.xxhash64(F.col("i"), F.lit(seed)).asc(), F.col("i").asc()],
        }[how]

    def _global_ranked(self, order) -> DataFrame:
        """(i, v, _rn): deterministic global rank under a TOTAL order (every
        ``order`` variant tie-breaks on i) WITHOUT a global single-task
        window.  Two-phase: range-repartition on the sort key, rank locally
        per partition (Window.partitionBy(partition id) — parallel), then
        add per-partition offsets.  The offset relation is one row per
        partition (bounded by the partition count, not the data), so its
        ordering window and broadcast are O(P)."""
        rp = (
            self.df.repartitionByRange(*order)
            .withColumn("_pid", F.spark_partition_id())
        )
        counts = rp.groupBy("_pid").agg(F.count("*").alias("_cnt"))
        woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.select(
            "_pid", F.coalesce(F.sum("_cnt").over(woff), F.lit(0)).alias("_off")
        )
        wloc = Window.partitionBy("_pid").orderBy(*order)
        return (
            rp.join(F.broadcast(offsets), "_pid")
            .withColumn("_rn", F.row_number().over(wloc) + F.col("_off"))
            .drop("_pid", "_off")
        )

    def selectk(self, k: int, how: str = "smallest", seed: int = 0) -> "VectorFrame":
        """Keep k entries (reference ss/vector.py:1407-1455).

        orderBy + limit plans as a distributed TakeOrdered (per-partition
        top-k then a k-row merge on the driver) — no global sort, no
        single-task window."""
        out = self.df.orderBy(*self._order(how, seed)).limit(k).select("i", "v")
        return VectorFrame(out, self._size)

    def sort(self, ascending: bool = True, permutation: bool = False):
        """ss.sort: values re-indexed by sort rank (reference
        ss/vector.py:1562-1622); two-phase distributed ranking.

        ``permutation=True`` also returns P with P[rank] = original index —
        the reference's (w, p) pair, from the same ranked relation."""
        order = self._order("smallest" if ascending else "largest")
        ranked = self._global_ranked(order)
        values = VectorFrame(
            ranked.select((F.col("_rn") - 1).alias("i"), "v"), self._size
        )
        if not permutation:
            return values
        perm = VectorFrame(
            ranked.select((F.col("_rn") - 1).alias("_k"), F.col("i").cast("long").alias("v"))
            .select(F.col("_k").alias("i"), "v"),
            self._size,
        )
        return values, perm

    def compactify(self, how: str = "first", seed: int = 0) -> "VectorFrame":
        """ss.compactify: squeeze stored values left (reference
        ss/vector.py:1456-1561); two-phase distributed ranking."""
        out = self._global_ranked(self._order(how, seed)).select(
            (F.col("_rn") - 1).alias("i"), "v"
        )
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
        agg/__init__.py catalog — mean, std, norms, positional first/last)."""
        from graph_python_spark.functions.ops import PositionalAgg

        expr = (aggfn.build(F.col("v"), F.col("i"))
                if isinstance(aggfn, PositionalAgg) else aggfn(F.col("v")))
        return self.df.agg(expr.alias("v")).first()["v"]

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
        """Prefix scan (reference core/ss/prefix_scan.py:12-183) as the
        classic two-phase distributed scan: range-partition by i, local
        prefix per partition (parallel windows), then ⊕-combine each
        partition's exclusive prefix of totals — the same up/down-sweep
        shape as the reference's blocked recipe, with partitions as blocks.
        The totals relation is one row per partition (O(P))."""
        from graph_python_spark.functions.ops import monoid as _monoid

        op = op or _monoid.plus
        rp = self.df.repartitionByRange(F.col("i").asc()).withColumn(
            "_pid", F.spark_partition_id()
        )
        wloc = Window.partitionBy("_pid").orderBy("i").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        local = rp.select("_pid", "i", op.agg(F.col("v")).over(wloc).alias("_lv"))
        totals = rp.groupBy("_pid").agg(op.agg(F.col("v")).alias("_tot"))
        woff = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
        offsets = totals.select("_pid", op.agg(F.col("_tot")).over(woff).alias("_off"))
        out = (
            local.join(F.broadcast(offsets), "_pid")
            .select(
                "i",
                F.when(F.col("_off").isNull(), F.col("_lv"))
                .otherwise(op.pairwise(F.col("_off"), F.col("_lv"))).alias("v"),
            )
        )
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
        # same kernel as binary.isclose (symmetric reference formula)
        from graph_python_spark.functions.ops import _isclose_factory

        a = self.df.withColumnRenamed("v", "_va")
        b = other.df.withColumnRenamed("v", "_vb")
        j = a.join(b, "i", "full_outer")
        close = _isclose_factory(rel_tol, abs_tol)(F.col("_va"), F.col("_vb"))
        bad = j.filter(F.col("_va").isNull() | F.col("_vb").isNull() | ~close)
        return bad.limit(1).count() == 0

    def to_coo(self) -> tuple[list[int], list[Any]]:
        rows = self.df.orderBy("i").collect()
        return [r["i"] for r in rows], [r["v"] for r in rows]

    def to_arrow(self, max_rows=None):
        """Arrow record-batch export (see MatrixFrame.to_arrow).
        DRIVER-MATERIALIZING — pass ``max_rows`` to fail fast."""
        from graph_python_spark.sources.io import vector_to_arrow
        return vector_to_arrow(self, max_rows=max_rows)

    @classmethod
    def from_arrow(cls, spark: SparkSession, table,
                   size: Optional[int] = None) -> "VectorFrame":
        from graph_python_spark.sources.io import vector_from_arrow
        return vector_from_arrow(spark, table, size)

    def __reduce__(self):
        """Pickle support (reference ``Vector.__reduce__`` pattern,
        matrix.py:257-273 for Matrix): serialize as driver-side COO +
        logical size + value type; unpickling rebuilds the DataFrame on
        the process's active SparkSession.  A collect, so sized for
        driver-fitting vectors — checkpoints (plans/iterate.py) remain the
        at-scale persistence path."""
        idx, vals = self.to_coo()
        return (_rebuild_vector,
                (idx, vals, self.size,
                 self.df.schema["v"].dataType.simpleString()))

    def to_dict(self) -> dict[int, Any]:
        return {r["i"]: r["v"] for r in self.df.collect()}

    @classmethod
    def from_dict(cls, spark: SparkSession, d: dict, size: Optional[int] = None,
                  dtype: str = "double") -> "VectorFrame":
        """{index: value} import (reference vector.py from_dict)."""
        idx = sorted(d)
        return cls.from_coo(spark, idx, [d[i] for i in idx], size, dtype=dtype)

    def head(self, n: int = 10) -> list[tuple[int, Any]]:
        """First n stored entries in index order (bounded limit)."""
        return [(r["i"], r["v"]) for r in self.df.orderBy("i").limit(n).collect()]

    def iter_pairs(self, prefetch_partitions: int = 1):
        """Streaming (i, v) iterator — one partition in driver memory at a
        time via toLocalIterator."""
        for r in self.df.orderBy("i").toLocalIterator(prefetch_partitions):
            yield (r["i"], r["v"])


def _active_spark() -> SparkSession:
    s = SparkSession.getActiveSession()
    return s if s is not None else SparkSession.builder.getOrCreate()


def _rebuild_vector(idx, vals, size, vtype) -> "VectorFrame":
    """Unpickle target for VectorFrame.__reduce__ (module-level so pickle
    can resolve it by name)."""
    spark = _active_spark()
    df = spark.createDataFrame(list(zip(idx, vals)), f"i long, v {vtype}")
    return VectorFrame(df, size)
