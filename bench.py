"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR plus the
north-rule scaling differential (same PageRank job at local[8] vs local[32]
on the same ~1e6-edge Zipf-skewed synthetic corpus graph; efficiency =
throughput@32 / (4 × throughput@8)).

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pagerank": {...}, "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_FILES = int(os.environ.get("SPARK_GRAFT_BENCH_FILES", "200000"))
PR_BENCH_ITERS = int(os.environ.get("SPARK_GRAFT_PR_ITERS", "10"))
SCALE_VERTICES = int(os.environ.get("SPARK_GRAFT_SCALE_VERTICES", "10000000"))
SCALE_ITERS = int(os.environ.get("SPARK_GRAFT_SCALE_ITERS", "7"))
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

# iterative-loop tuning (measured, see BASELINE.md): AQE off avoids per-
# shuffle stage barriers inside the fixed loop; shuffled-hash join beats
# sort-merge for edges ⋈ rank-vector (build side is O(V), stream side O(E),
# and re-sorting the cached edge table every iteration is pure waste)
LOOP_CONF = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}

# Shuffle partitions are sized to the DATA and held CONSTANT across both
# parallelism levels (a real N vs 4N cluster comparison keeps the same
# partitioning for the same input): per-task aggregation working sets then
# stay identical and only the thread count varies.  Heap is kept moderate —
# a 48g heap balloons to 30+ GB RSS and its G1 pauses put 2-10× spikes on
# individual iterations (measured); 16g keeps collections short.
SCALE_SHUFFLE = int(os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE", "32"))


def _get_spark(parallelism: int, loop_tuned: bool = False):
    from graph_python_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    return get_spark(app=f"bench-{parallelism}", parallelism=parallelism,
                     shuffle_partitions=SCALE_SHUFFLE if loop_tuned else parallelism,
                     extra_conf=LOOP_CONF if loop_tuned else None)


def _bench_edges_path() -> str:
    return os.path.join(CACHE_DIR, f"edges_n{BENCH_FILES}")


def ensure_bench_graph(spark) -> str:
    """Generate (once) the Zipf-skewed corpus edge table at bench scale."""
    path = _bench_edges_path()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pyspark.sql import functions as F

        from graph_python_spark.sources.corpus import extract_edges, generate_corpus

        corpus = generate_corpus(spark, n_repos=BENCH_FILES // 8, files_per_repo=8)
        # analytic vertex ids (generator encodes file id in repo/path) — the
        # general sorted-dictionary path is exercised in tests
        files = corpus.select("repo", "path").distinct()
        verts = files.select(
            (F.regexp_extract("repo", r"(\d+)", 1).cast("long") * 8
             + F.regexp_extract("path", r"m(\d+)", 1).cast("long")).alias("id"),
            "repo", "path",
        )
        edges = extract_edges(corpus, verts)
        edges.write.mode("overwrite").parquet(path)
    return path


def run_headlines(spark, results: dict) -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    headliners = [
        "pagerank", "cc_converged", "triangle_count", "mxm_plus_times",
        "degree_out", "minhash_lsh", "ann_cosine_topk", "token_stats",
        "windowed_events",
    ]
    qs = entry.queries()
    for name in headliners:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        results["queries"][name] = round(time.time() - t0, 3)
        results.setdefault("rows", {})[name] = n


def timed_pagerank(spark, edges_path: str, iters: int) -> dict:
    """BASELINE.md protocol: steady-state per-iteration wall-clock of the
    SpMV loop after one-shot graph prep (adjacency build; reported
    separately) and 2 discarded warmup iterations (JIT/codegen).  Headline
    throughput = nnz / median(iteration time) — robust to single-JVM GC
    spikes that a multi-executor cluster doesn't serialize."""
    from pyspark.sql import functions as F

    from graph_python_spark.algorithms.pagerank import iteration_times, prepare_graph

    if edges_path == "<scale-fixture>":
        from graph_python_spark.sources.corpus import scale_fixture_edges

        edges = scale_fixture_edges(spark, SCALE_VERTICES).select(
            F.col("src").alias("i"), F.col("dst").alias("j")
        )
    else:
        edges = spark.read.parquet(edges_path).select(
            F.col("src").alias("i"), F.col("dst").alias("j")
        )
    # adjacency partition count MUST equal spark.sql.shuffle.partitions:
    # the groupBy output is then co-partitioned with the cached adjacency
    # and the per-iteration join needs no exchange on either side
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t0 = time.time()
    prepared = prepare_graph(edges, partitions=n_part)
    prep_s = round(time.time() - t0, 3)
    nnz = prepared.adj.agg(F.sum(F.size("js"))).first()[0]

    times = iteration_times(prepared, iterations=iters, warmups=2)
    med = statistics.median(times)
    total = sum(times)
    return {
        "edges": nnz,
        "prep_seconds": prep_s,
        "iterations": iters,
        "iter_times": [round(t, 2) for t in times],
        "seconds": round(total, 3),
        "median_iter_sec": round(med, 3),
        "iters_per_sec": round(1.0 / med, 4),
        "edges_per_sec": round(nnz / med, 1),
        "vertices": prepared.n,
    }


def main() -> None:
    results = {"metric": "headline_queries_total_sec", "unit": "sec",
               "sf": SF_DIR, "queries": {}}

    spark = _get_spark(CPUS)
    run_headlines(spark, results)
    edges_path = ensure_bench_graph(spark)
    results["pagerank_bench"] = timed_pagerank(spark, edges_path, PR_BENCH_ITERS)
    spark.stop()

    # scaling differential: N vs 4N parallelism on the SAME input/job
    # (local[8] vs local[32] stands in for N vs 4N executors; the fixture is
    # a ~60M-edge Zipf graph so per-iteration compute dominates fixed costs).
    # Each level runs in its OWN subprocess so both get an identical JVM
    # lifecycle — sharing one process lets the second level inherit the
    # first's JIT-compiled code and skews the ratio (scripts/scale_runner.py)
    import subprocess

    scaling = {"vertices": SCALE_VERTICES, "iterations": SCALE_ITERS,
               "conf": {**LOOP_CONF,
                        "spark.sql.shuffle.partitions": str(SCALE_SHUFFLE),
                        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "16g")}}
    runner = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "scale_runner.py")
    for p in (8, 32):
        proc = subprocess.run(
            [sys.executable, runner, str(p), str(SCALE_VERTICES), str(SCALE_ITERS)],
            capture_output=True, text=True, timeout=1800,
        )
        line = proc.stdout.strip().splitlines()[-1]
        scaling[f"local{p}"] = json.loads(line)
    eff = scaling["local32"]["edges_per_sec"] / (4.0 * scaling["local8"]["edges_per_sec"])
    scaling["efficiency_8_to_32"] = round(eff, 4)
    results["scaling"] = scaling

    results["value"] = round(sum(results["queries"].values()), 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
