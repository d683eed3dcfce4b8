"""Scale evidence for the three round-3 session additions.

Usage: python scripts/scale_evidence_r3b.py [n_vertices] [n_docs]

Same protocol as scripts/scale_evidence_r3.py (one local[32] session, 20g
heap, timings as JSON lines, deterministic fixtures generated in-plan):

  * landmark_distances — 8 landmarks x 8 min-plus rounds on the 22.9M-edge
    Zipf fixture: the claim under test is that k landmarks cost ~ONE BFS
    (one frontier relation keyed (lm, id), same shuffle count).
  * merge_near_dups — minhash LSH pairs -> FastSV clusters -> quality
    argmax over a 1M-doc synthetic corpus with a heavy exact-dup tail
    (id % 4 == 0 rows repeat earlier text), the regime the representative
    collapse inside minhash_lsh_pairs exists for.
  * containment_pairs — char-8-gram inverted index over 200k docs with
    df_cap=64: the per-shingle self-join is bounded by df_cap^2; the row
    evidences the cap holds on a corpus with a duplicated-prefix tail.
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

    spark = get_spark(app="scale-evidence-r3b",
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

    def run_landmarks():
        from graph_python_spark.algorithms.traversal import landmark_distances
        lms = [0, 1, 2, 3, 4, 5, 6, 7]
        d = landmark_distances(edges, landmarks=lms, rounds=8)
        rows = d.count()
        return {"landmarks": len(lms), "rounds": 8, "state_rows": int(rows)}
    timed("landmark_dist", run_landmarks)
    edges.unpersist()

    # 50k hashed vocabulary: with a tiny word list every document is a
    # near-dup of every other (first attempt: the LSH candidate relation
    # exploded quadratically and spilled the disk dry) — realistic corpora
    # have Zipfian but WIDE vocabularies, and the dup structure under test
    # is the injected exact-dup groups, not vocabulary collisions
    base_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), (F.abs(F.xxhash64("gid")) % 33) + 8),
            lambda w: F.concat(
                F.lit("w"),
                (F.abs(F.xxhash64(F.col("gid"), w)) % 50000).cast("string")),
        ),
    )
    # heavy exact-dup tail: every id with id%4==0 reuses the text of
    # gid = id - (id % 16) — groups of up to 4 exact dups
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 == 0, F.col("id") - (F.col("id") % 16))
         .otherwise(F.col("id")).alias("gid"),
    ).select("doc_id", base_text.alias("text")).localCheckpoint(eager=True)
    docs.count()

    def run_merge():
        from graph_python_spark.pipeline.dedup import (
            merge_near_dups, minhash_lsh_pairs)
        from graph_python_spark.pipeline.text import quality_score
        pairs = minhash_lsh_pairs(docs, k=8, bands=4,
                                  threshold_num=9, threshold_den=10)
        out = merge_near_dups(pairs, quality_score(docs))
        n_clusters = out.count()
        return {"docs": n_docs, "clusters": int(n_clusters)}
    timed("dedup_merge", run_merge)

    def run_containment():
        from graph_python_spark.pipeline.dedup import containment_pairs
        # keep ids ≡ 0..4 (mod 16): two members (16k, 16k+4) of every
        # exact-dup group survive, so the expected pair count is exactly
        # the number of complete 16-blocks (a %5 subset kept at most one
        # member per group and the first run found 0 pairs — true, but
        # evidence of nothing)
        small = docs.filter(F.col("doc_id") % 16 <= 4)
        n_small = small.count()
        out = containment_pairs(small, n=8, threshold_num=9,
                                threshold_den=10, df_cap=64)
        n_pairs = out.count()
        return {"docs": int(n_small), "pairs": int(n_pairs), "df_cap": 64}
    timed("ngram_containment", run_containment)

    spark.stop()


if __name__ == "__main__":
    main()
