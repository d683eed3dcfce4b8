"""Round-5 kmeans scale evidence: kmeans_fixed over 10M synthetic 64-dim
embeddings — exercising the ADVICE-r4 fix (loop-shuffle width from the
input's SCAN PARTITION COUNT, no corpus count() job) at a scale where the
removed count() was a real extra pass.

The embeddings are JVM-synthesized (xxhash64-derived components, unit-ish
scale) so the job is deterministic and needs no external data; k=64,
3 Lloyd iterations over a 256k-row training sample (the sampled-training
path the ivf_pq_residual coarse quantizer uses), then one broadcast-fold
assignment pass over all 10M rows — the only full-corpus stages are the
one training-sample scan and the final map-side assignment (no shuffle).

Usage: python scripts/scale_evidence_r5.py [n_vectors]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_vec = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    dim, k = 64, 64

    from pyspark.sql import functions as F

    from graph_python_spark.pipeline.similarity import kmeans_train
    from graph_python_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark(app="scale-evidence-r5",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})

    emb = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda d: ((F.abs(F.xxhash64(F.col("id"), d)) % 2001)
                       / F.lit(1000.0) - F.lit(1.0)).cast("double")
        ).alias("embedding"),
    )

    t0 = time.time()
    out, _cents = kmeans_train(emb, k=k, iterations=3, sample_n=262_144)
    agg = out.agg(
        F.count("*").alias("n"),
        F.countDistinct("cluster").alias("clusters"),
        F.round(F.avg("dist2"), 4).alias("mean_dist2"),
    ).collect()[0]
    wall = time.time() - t0
    print(json.dumps({
        "op": "kmeans_fixed", "n_vectors": n_vec, "dim": dim, "k": k,
        "iterations": 3, "sample_n": 262144,
        "rows": agg["n"], "clusters": agg["clusters"],
        "mean_dist2": agg["mean_dist2"], "wall_sec": round(wall, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
