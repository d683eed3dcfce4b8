"""Driver-style correctness check: run each queries() entry on Spark and its
oracle_sql() on DuckDB over the same parquet; compare row count, schema
(column names), and values (sorted columns + rows, exact after the query's
own rounding).

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from graph_python_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(f"schema: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}")
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rows: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    # Driver-strictness dtype gate: the driver hashes values BEFORE any
    # coercion, so a float64 Spark column vs an int64 oracle column
    # hash-mismatches even when every value is numerically identical
    # (the r4 weighted_matching red row).  Flag kind disagreements here
    # so the builder sweep catches what the driver would.
    for c in sorted(spark_pdf.columns):
        sk = spark_pdf[c].dtype.kind
        dk = duck_pdf[c].dtype.kind
        num = {"i", "u", "f"}
        if sk in num and dk in num and sk != dk and "f" in (sk, dk):
            problems.append(
                f"dtype kind: col {c} spark={spark_pdf[c].dtype} duck={duck_pdf[c].dtype} "
                "(float-vs-int would hash-mismatch in the driver)")
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                ok = np.allclose(a[c].fillna(-9e99), b[c].fillna(-9e99), rtol=0, atol=0)
                if not ok:
                    diff = (a[c] - b[c]).abs().max()
                    problems.append(f"col {c}: max |diff| = {diff}")
            else:
                neq = (a[c].fillna("<null>") != b[c].fillna("<null>")).sum() if a[c].dtype == object else (a[c] != b[c]).sum()
                if neq:
                    mism = a.loc[(a[c] != b[c]).to_numpy().nonzero()[0][:3]]
                    problems.append(f"col {c}: {neq} mismatched values; sample spark rows:\n{mism}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # 4g result ceiling: at sf0.1 the dense-extent queries collect ~1 GiB
    # through the driver for the comparison (a harness cost — the engine
    # side never collects); DuckDB temp goes to the big disk, not tmpfs.
    spark = get_spark(app="oracle-check", parallelism=8, shuffle_partitions=8,
                      extra_conf={"spark.driver.maxResultSize": "4g"})
    con = duckdb.connect()
    os.makedirs("/tmp/duckdb_tmp", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duckdb_tmp'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            results[name] = [f"SPARK ERROR: {type(exc).__name__}: {exc}"]
            print(f"  {name}: {results[name][0][:500]}")
            continue
        if name not in oracles:
            results[name] = None if len(spark_pdf) >= 0 else ["empty"]
            print(f"  {name}: rows-only, {len(spark_pdf)} rows")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as exc:
            results[name] = [f"DUCKDB ERROR: {type(exc).__name__}: {exc}"]
            print(f"  {name}: {results[name][0][:500]}")
            continue
        results[name] = compare(name, spark_pdf, duck_pdf)
        status = "OK" if not results[name] else "MISMATCH"
        print(f"  {name}: {status} ({len(spark_pdf)} rows)")
        for p in results[name] or []:
            print(f"      {p}")

    bad = {k: v for k, v in results.items() if v}
    print(f"\n{'ALL OK' if not bad else f'{len(bad)} FAILING: {sorted(bad)}'}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
