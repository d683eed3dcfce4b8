"""spark-submit entrypoint: PageRank over an edge parquet, with durable
per-iteration checkpointing and resumable state (the north-rule delivery
shape: ``spark-submit --py-files dist/graph_python_spark.zip
scripts/pagerank_job.py --edges ... --output ... --checkpoint-dir ...``).

The package arrives via --py-files; this script only parses args and calls
the library.  On a cluster the same invocation works unchanged — paths move
to object storage and master comes from the cluster manager.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", help="parquet with columns src,dst (or i,j)")
    ap.add_argument("--synthetic-vertices", type=int, default=0,
                    help="generate a Zipf fixture graph instead of reading --edges")
    ap.add_argument("--output", required=True, help="output parquet dir for scores")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="durable IterationState dir (enables resume)")
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--itermax", type=int, default=100)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("pagerank_job").getOrCreate()

    from graph_python_spark.algorithms.pagerank import pagerank
    from graph_python_spark.plans.iterate import IterationState

    if args.synthetic_vertices:
        from graph_python_spark.sources.corpus import scale_fixture_edges

        edges = scale_fixture_edges(spark, args.synthetic_vertices)
    else:
        edges = spark.read.parquet(args.edges)
    cols = edges.columns
    if "src" in cols:
        edges = edges.select(F.col("src").alias("i"), F.col("dst").alias("j"))
    else:
        edges = edges.select("i", "j")

    ckpt = IterationState(args.checkpoint_dir, spark) if args.checkpoint_dir else None
    scores, iters, rdiffs = pagerank(
        edges, damping=args.damping, tol=args.tol, itermax=args.itermax,
        partitions=args.partitions, checkpoint=ckpt,
    )
    scores.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"iterations": iters, "final_rdiff": rdiffs[-1] if rdiffs else None,
                      "output": args.output}))
    spark.stop()


if __name__ == "__main__":
    main()
