"""Deterministic graph derivations from the driver's TPC-H-ish parquet.

These define the shared edge tables used by the oracle-checked correctness
queries (__spark_entry__.py): every derivation is exactly expressible in
ANSI SQL so DuckDB can rebuild the identical graph.

  * ``customer_graph``       — directed weighted graph over customers:
        src = o_custkey, dst = o_orderkey % |customer|, self-loops dropped,
        duplicate (src, dst) collapsed with w = count (dup_op=plus — the
        Matrix.build default, reference graphblas/core/matrix.py:643-698).
  * ``supplier_part_graph``  — bipartite supplier→part graph from lineitem,
        part ids offset by PART_OFFSET into a disjoint id range,
        w = lineitem count per (supplier, part).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PART_OFFSET = 100000


def customer_count(spark: SparkSession, sf_dir: str) -> int:
    return spark.read.parquet(f"{sf_dir}/customer.parquet").count()


def customer_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src long, dst long, w long); see module docstring."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = customer_count(spark, sf_dir)
    return (
        orders.select(
            F.col("o_custkey").alias("src"),
            (F.col("o_orderkey") % F.lit(n)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").cast("long").alias("w"))
    )


def customer_graph_sql() -> str:
    """DuckDB CTE body reconstructing customer_graph as ``eg``."""
    return """
nv AS (SELECT count(*) AS n FROM customer),
eg AS (
  SELECT o_custkey AS src,
         o_orderkey % (SELECT n FROM nv) AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM orders
  WHERE o_custkey <> o_orderkey % (SELECT n FROM nv)
  GROUP BY 1, 2
)"""


THIN_PCT = 12
THIN_MULT = 2654435761  # Knuth multiplicative hash constant (public domain)


def thinned_customer_graph(spark: SparkSession, sf_dir: str,
                           pct: int = THIN_PCT) -> DataFrame:
    """Sparse variant of :func:`customer_graph` keeping ~pct% of order
    edges via a deterministic multiplicative hash of o_orderkey — the
    dense customer graph is one giant SCC, so structure reports (bow-tie)
    need a thinned derivative with real IN/OUT/tendril regions.
    (src long, dst long), unweighted, self-loops dropped."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = customer_count(spark, sf_dir)
    return (
        orders.filter((F.col("o_orderkey") * F.lit(THIN_MULT)) % 100
                      < F.lit(pct))
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("o_orderkey") % F.lit(n)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def thinned_customer_graph_sql(pct: int = THIN_PCT) -> str:
    """DuckDB CTE body reconstructing thinned_customer_graph as ``tg``."""
    return f"""
nv AS (SELECT count(*) AS n FROM customer),
tg AS (
  SELECT DISTINCT o_custkey AS src,
         o_orderkey % (SELECT n FROM nv) AS dst
  FROM orders
  WHERE (o_orderkey * {THIN_MULT}) % 100 < {pct}
    AND o_custkey <> o_orderkey % (SELECT n FROM nv)
)"""


def supplier_part_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy(
            F.col("l_suppkey").alias("src"),
            (F.lit(PART_OFFSET) + F.col("l_partkey")).alias("dst"),
        )
        .agg(F.count("*").cast("long").alias("w"))
    )


def supplier_part_graph_sql() -> str:
    """DuckDB CTE body reconstructing supplier_part_graph as ``sp``."""
    return f"""
sp AS (
  SELECT l_suppkey AS src,
         {PART_OFFSET} + l_partkey AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem
  GROUP BY 1, 2
)"""
