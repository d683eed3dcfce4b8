"""spark-submit entrypoint: the training-data batch-assembly pipeline over
a documents parquet (the delivery shape for the pipeline side, next to
``pagerank_job.py`` for the graph side)::

    spark-submit --py-files dist/graph_python_spark.zip \\
        scripts/pipeline_job.py --docs .../documents.parquet \\
        --output /out --budget 2048

Runs quality gate -> exact dedup -> deterministic split -> sequence-pack
the train split (``pipeline.packing.pipeline_pack_e2e``), writes the packed
assignment parquet plus a one-line JSON report (docs in/kept/packed, bins,
fill).  The package arrives via --py-files; this script only parses args
and calls the library — on a cluster the same invocation works unchanged.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="parquet with doc_id,text")
    ap.add_argument("--output", required=True, help="output dir for the packed parquet")
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--train-frac", type=float, default=0.8)
    ap.add_argument("--valid-frac", type=float, default=0.1)
    ap.add_argument("--salt", type=int, default=47)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("pipeline_job").getOrCreate()

    from graph_python_spark.pipeline.packing import pipeline_pack_e2e

    docs = spark.read.parquet(args.docs)
    packed = pipeline_pack_e2e(docs, budget=args.budget,
                               train_frac=args.train_frac,
                               valid_frac=args.valid_frac, salt=args.salt)
    packed.write.mode("overwrite").parquet(args.output)

    out = spark.read.parquet(args.output)
    stats = out.agg(
        F.count("*").alias("docs_packed"),
        F.sum("n_tokens").alias("tokens_packed"),
        (F.max("bin_end") + 1).alias("n_bins"),
        F.sum("crosses").alias("boundary_crossers"),
    ).first()
    report = {
        "docs_in": docs.count(),
        "docs_packed": int(stats["docs_packed"]),
        "tokens_packed": int(stats["tokens_packed"] or 0),
        "n_bins": int(stats["n_bins"] or 0),
        "boundary_crossers": int(stats["boundary_crossers"] or 0),
        "budget": args.budget,
        "fill_ratio": round(
            (stats["tokens_packed"] or 0)
            / (args.budget * max(int(stats["n_bins"] or 0), 1)), 4),
    }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
