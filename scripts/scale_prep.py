"""One-shot builder for the scaling fixture's adjacency parquet.

Usage: python scripts/scale_prep.py <n_vertices> <out_dir>

Runs UNPINNED at full host parallelism in its own process (so its JVM dies
with it and cannot contaminate the pinned probes that follow), builds the
deterministic Zipf fixture's prepared adjacency (i, js, inv_d) exactly as
``pagerank._prepare`` would, and writes it to parquet plus a meta sidecar
(vertex count, nnz, damping).

Why: the adjacency build is loop-invariant, UNTIMED prep (BASELINE.md
protocol reports it separately from the gate statistic), yet it cost ~40%
of every local[2] probe's wall-clock when rebuilt per run.  Prebuilding it
once lets the same bench budget sample MORE independent noise windows with
alternating (local2, local8) pairs — the lever that makes the ≥0.8 gate
robust to this host's multi-minute hypervisor-steal windows.  Each probe
re-establishes the hash(i) layout itself (read + repartition + cache), so
the measured iteration loop is identical to the build-in-process path.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_vertices = int(sys.argv[1])
    out_dir = sys.argv[2]
    degree_scale = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    damping = float(os.environ.get("SPARK_GRAFT_SCALE_DAMPING", "0.85"))
    shuffle = int(os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE", "32"))

    from pyspark.sql import functions as F

    from graph_python_spark.algorithms.pagerank import prepare_graph
    from graph_python_spark.session import get_spark
    from graph_python_spark.sources.corpus import scale_fixture_edges

    spark = get_spark(app=f"scale-prep-{n_vertices}")
    edges = scale_fixture_edges(spark, n_vertices, degree_scale).select(
        F.col("src").alias("i"), F.col("dst").alias("j")
    )
    prepared = prepare_graph(edges, damping=damping, partitions=shuffle)
    nnz = prepared.adj.agg(F.sum(F.size("js"))).first()[0]
    prepared.adj.write.mode("overwrite").parquet(out_dir)
    with open(os.path.join(out_dir, "_scale_meta.json"), "w") as f:
        json.dump({"n": prepared.n, "nnz": int(nnz), "damping": damping,
                   "n_vertices_param": n_vertices,
                   "degree_scale": degree_scale}, f)
    spark.stop()
    print(json.dumps({"out": out_dir, "n": prepared.n, "nnz": int(nnz)}))


if __name__ == "__main__":
    main()
