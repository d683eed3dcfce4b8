"""Round-4 DSIR scale evidence: dsir_weights over a 10M-document
synthetic corpus (the pipeline_pack_e2e fixture generator — JVM-side
text synthesis, two "dialects" so the target/raw distributions differ).

Usage: python scripts/scale_evidence_r4c.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    from pyspark.sql import functions as F

    from graph_python_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    spark = get_spark(app="scale-evidence-r4c",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    sc = spark.sparkContext

    # two vocab dialects: target docs (20%) draw from vocab_a-heavy mix,
    # raw-only docs from vocab_b-heavy — DSIR should separate them
    vocab_a = ["the", "of", "data", "spark", "graph", "table", "join",
               "scan", "rank", "edge", "node", "batch", "query", "hash",
               "sort", "agg", "row", "column", "shuffle", "stream"]
    vocab_b = ["le", "la", "donnees", "etincelle", "graphe", "tableau",
               "jointure", "balayage", "rang", "arete", "noeud", "lot",
               "requete", "hachage", "tri", "ligne", "colonne", "flux",
               "melange", "somme"]

    def words(vocab, salt):
        arr = F.array(*[F.lit(v) for v in vocab])
        return F.transform(
            F.sequence(F.lit(1), (F.abs(F.xxhash64("id")) % 33) + 8),
            lambda w: F.element_at(
                arr, (F.abs(F.xxhash64(F.col("id"), w, F.lit(salt)))
                      % 20 + 1).cast("int")))

    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5 == 0).alias("is_tgt"),
        F.concat_ws(" ", F.when(F.col("id") % 5 == 0, words(vocab_a, 1))
                    .otherwise(words(vocab_b, 2))).alias("text"),
    ).localCheckpoint(eager=True)
    print(json.dumps({"n_docs": int(docs.count())}), flush=True)

    def run():
        from graph_python_spark.pipeline.sampling import dsir_weights
        out = dsir_weights(docs, "is_tgt", n_buckets=8192)
        stats = out.groupBy("is_target").agg(
            F.count("*").alias("n"),
            F.round(F.avg("log_weight"), 3).alias("mean_logw")).collect()
        return {f"target={r['is_target']}": {"n": int(r["n"]),
                                             "mean_logw": float(r["mean_logw"])}
                for r in stats}

    sc.setJobGroup("dsir", "dsir")
    t0 = time.time()
    res = run()
    print(json.dumps({"op": "dsir_weights_10M", "seconds":
                      round(time.time() - t0, 1), "result": res}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
