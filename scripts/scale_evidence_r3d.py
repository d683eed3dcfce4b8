"""Scale evidence for the round-3 session-11/12 additions.

Usage: python scripts/scale_evidence_r3d.py [n_vertices] [n_docs]

Same protocol as scale_evidence_r3/r3b/r3c (one local[32] session, 20g
heap, JSON lines, deterministic in-plan fixtures):

  * degree_relabel + relabel_locality — two-phase global rank at 22.9M
    edges; the locality row also CHECKS the claim (hubs get small ids →
    mean |Δid| over edges drops vs the hash-random original ids).
  * spam_mass — full pagerank_3f AND core-biased PPR (1,000 trusted
    seeds), 8 iterations each, joined into the VLDB'06 mass ratio: two
    contrib loops over the same pinned transition relation.
  * simrank — 2 sweeps on a ~5.7M-edge fixture with the documented scale
    sieves ON (eps score threshold + max_indegree hub prune): the pair
    relation is the quadratic object, and the row records its size before
    and after the sieve so the bound is visible, not asserted.
  * source_overlap — exact-content mode (sha256 keys, shingle_width=0)
    over 1M docs spread across 4,096 sources with an injected cross-
    source dup tail; the inverted-index self-join is the only wide
    exchange.
  * pmi_topk — bigram PMI top-50 over the same 1M-doc corpus: one
    corpus-pass groupBy + tiny positional re-aggregations.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEMORY", "20g")


def main() -> None:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    from pyspark.sql import functions as F

    from graph_python_spark.session import get_spark
    from graph_python_spark.sources.corpus import scale_fixture_edges

    spark = get_spark(app="scale-evidence-r3d",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    sc = spark.sparkContext

    def timed(name, fn):
        sc.setJobGroup(name, name)
        t0 = time.time()
        out = fn()
        dt = round(time.time() - t0, 1)
        print(json.dumps({"op": name, "seconds": dt, "result": out}),
              flush=True)

    edges = (scale_fixture_edges(spark, n_vertices, 1)
             .select(F.col("src").alias("i"), F.col("dst").alias("j"))
             .localCheckpoint(eager=True))
    nnz = edges.count()
    print(json.dumps({"fixture_edges": nnz, "n_vertices": n_vertices,
                      "n_docs": n_docs}), flush=True)

    def run_relabel():
        from graph_python_spark.algorithms.relabel import (
            degree_relabel, relabel_locality)
        e = edges.select(F.col("i").alias("src"), F.col("j").alias("dst"))
        m = degree_relabel(e).localCheckpoint(eager=True)
        n_ids = m.count()
        loc = relabel_locality(e, m).first()
        m.unpersist()
        return {"relabeled": int(n_ids),
                "mean_gap_old": loc["mean_gap_old"],
                "mean_gap_new": loc["mean_gap_new"],
                "n_edges_sym": int(loc["n_edges"])}
    timed("degree_relabel", run_relabel)

    def run_spam_mass():
        from graph_python_spark.algorithms.trustrank import spam_mass
        trusted = spark.range(1000).select(
            (F.abs(F.xxhash64("id", F.lit(3))) % n_vertices).alias("id")
        ).distinct()
        out = spam_mass(edges, trusted, iterations=8)
        row = out.agg(
            F.count("*").alias("n"),
            F.sum((F.col("spam_mass") > 0.99).cast("long")).alias("full_mass"),
        ).first()
        return {"iterations": 8, "trusted": 1000,
                "scored_vertices": int(row["n"]),
                "spam_mass_gt_99pct": int(row["full_mass"])}
    timed("spam_mass", run_spam_mass)
    edges.unpersist()

    def run_simrank():
        from graph_python_spark.algorithms.simrank import simrank
        n_sr = max(n_vertices // 4, 1)
        e_sr = (scale_fixture_edges(spark, n_sr, 1)
                .select(F.col("src"), F.col("dst"))
                .localCheckpoint(eager=True))
        m = e_sr.count()
        s = simrank(e_sr, iters=2, eps=0.02, max_indegree=32)
        n_pairs = s.count()
        e_sr.unpersist()
        return {"edges": int(m), "iters": 2, "eps": 0.02,
                "max_indegree": 32, "score_pairs": int(n_pairs)}
    timed("simrank", run_simrank)

    # 1M docs, 4,096 sources, 50k hashed vocab; id%4==0 reuses the text of
    # gid = id - (id%16), and source = doc_id % 4096, so each dup group of
    # 4 spans 4 DIFFERENT sources — the injected cross-source overlap.
    base_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), (F.abs(F.xxhash64("gid")) % 33) + 8),
            lambda w: F.concat(
                F.lit("w"),
                (F.abs(F.xxhash64(F.col("gid"), w)) % 50000).cast("string")),
        ),
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, F.col("id") - (F.col("id") % 16))
         .otherwise(F.col("id")).alias("gid"),
        F.concat(F.lit("s"), (F.col("id") % 4096).cast("string")).alias("source"),
    ).select("doc_id", "source", base_text.alias("text")).localCheckpoint(eager=True)
    docs.count()

    def run_source_overlap():
        from graph_python_spark.pipeline.dedup import source_overlap
        out = source_overlap(docs, min_shared=1, shingle_width=0)
        row = out.agg(F.count("*").alias("pairs"),
                      F.sum("shared").alias("shared_total")).first()
        return {"docs": n_docs, "sources": 4096, "mode": "sha256",
                "source_pairs": int(row["pairs"]),
                "shared_total": int(row["shared_total"])}
    timed("source_overlap", run_source_overlap)

    def run_pmi():
        from graph_python_spark.pipeline.text import pmi_topk
        out = pmi_topk(docs, k=50, min_count=5)
        rows = out.count()
        return {"docs": n_docs, "topk_rows": int(rows)}
    timed("pmi_topk", run_pmi)

    spark.stop()


if __name__ == "__main__":
    main()
