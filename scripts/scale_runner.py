"""Single-parallelism-level scaling probe, run in its OWN process.

Usage: python scripts/scale_runner.py <parallelism> [n_vertices] [iters]
Prints one JSON line with per-iteration times, median, and edges/sec.

Why a separate process per level (bench.py spawns this): the efficiency
comparison must give both parallelism levels an identical JVM lifecycle.
Measured on this engine: running local[8] and local[32] sequentially in one
process lets the second level inherit the first's fully JIT-compiled code
(plus a long headline phase's warmth), which skews the ratio by up to 2.5×
in either direction depending on order (observed 0.17, 0.62, 1.65 for the
same workload).  A fresh process per level — exactly how two real cluster
deployments of different sizes would run — with 3 discarded warmup
iterations (JIT compilation takes visibly longer at low core counts).
See BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parallelism = int(sys.argv[1])
    n_vertices = int(sys.argv[2]) if len(sys.argv) > 2 else 10000000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    shuffle = int(os.environ.get("SPARK_GRAFT_SCALE_SHUFFLE", "32"))
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "16g")
    # tmpfs shuffle dirs: on a real N vs 4N cluster every executor brings
    # its own local disk, so aggregate shuffle bandwidth scales with N; a
    # single host's one virtual disk is a fixed artifact that caps the
    # higher-parallelism run only.  tmpfs makes shuffle I/O scale with
    # memory bandwidth at BOTH levels (must be set before the JVM forks).
    if os.path.isdir("/dev/shm"):
        shm = "/dev/shm/spark-scale"
        os.makedirs(shm, exist_ok=True)
        os.environ.setdefault("SPARK_LOCAL_DIRS", shm)

    # Pin this process (and the JVM it forks) to exactly `parallelism` CPUs.
    # An N-executor cluster has N cores TOTAL — GC threads, JIT compiler
    # threads, netty/shuffle pools included.  Without pinning, local[8] on a
    # 32-core host gives the "8-executor" run 24 idle cores' worth of GC and
    # OS slack that a real deployment would not have, which understates the
    # honest N→4N ratio (round 1: driver measured 0.53 while the workload
    # itself scales).  sched_setaffinity is inherited by the forked JVM, and
    # JDK 17 sizes availableProcessors from the affinity mask.
    pinned_cpus = None
    if hasattr(os, "sched_setaffinity"):
        host_cpus = sorted(os.sched_getaffinity(0))
        if len(host_cpus) >= parallelism:
            pinned_cpus = host_cpus[:parallelism]
            os.sched_setaffinity(0, set(pinned_cpus))

    import time

    from pyspark.sql import functions as F

    from graph_python_spark.algorithms.pagerank import iteration_times, prepare_graph
    from graph_python_spark.session import get_spark
    from graph_python_spark.sources.corpus import scale_fixture_edges

    # ParallelGC: the iteration loop is a batch workload (explode + hash
    # agg churn); the throughput collector measured ~10% faster and less
    # spiky than G1 here, at both parallelism levels
    java_opts = f"-XX:ActiveProcessorCount={parallelism} " + \
        os.environ.get("SPARK_GRAFT_JAVA_OPTS", "-XX:+UseParallelGC")
    loop_conf = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # size JVM internal pools (GC, JIT, ForkJoin) to the pinned core
        # count even if affinity detection is unavailable
        "spark.driver.extraJavaOptions": java_opts.strip(),
    }
    offheap = os.environ.get("SPARK_GRAFT_OFFHEAP", "")
    if offheap:
        loop_conf["spark.memory.offHeap.enabled"] = "true"
        loop_conf["spark.memory.offHeap.size"] = offheap
    spark = get_spark(app=f"scale-{parallelism}", parallelism=parallelism,
                      shuffle_partitions=shuffle, extra_conf=loop_conf)
    # Prebuilt adjacency (scripts/scale_prep.py): loading it re-establishes
    # the exact layout the in-process build ends with — hash(i) repartition
    # + cache — so the measured iteration loop is identical; only the
    # untimed prep gets cheaper, letting the bench afford more probe pairs.
    adj_dir = os.environ.get("SPARK_GRAFT_SCALE_ADJ", "")
    meta_path = os.path.join(adj_dir, "_scale_meta.json") if adj_dir else ""
    if adj_dir and os.path.exists(meta_path):
        from graph_python_spark.algorithms.pagerank import PreparedGraph

        with open(meta_path) as fh:
            meta = json.load(fh)
        t0 = time.time()
        adj = spark.read.parquet(adj_dir).repartition(shuffle, "i").cache()
        adj.count()
        prep_s = round(time.time() - t0, 3)
        prepared = PreparedGraph(adj, None, meta["n"], meta["damping"])
        nnz = meta["nnz"]
    else:
        degree_scale = int(os.environ.get("SPARK_GRAFT_SCALE_DEGREE", "1"))
        edges = scale_fixture_edges(spark, n_vertices, degree_scale).select(
            F.col("src").alias("i"), F.col("dst").alias("j")
        )
        t0 = time.time()
        prepared = prepare_graph(edges, partitions=shuffle)
        prep_s = round(time.time() - t0, 3)
        nnz = prepared.adj.agg(F.sum(F.size("js"))).first()[0]

    times = iteration_times(prepared, iterations=iters, warmups=3)
    med = statistics.median(times)
    print(json.dumps({
        "parallelism": parallelism,
        "pinned_cpus": pinned_cpus,
        "shuffle_partitions": shuffle,
        "edges": nnz,
        "vertices": prepared.n,
        "prep_seconds": prep_s,
        "iterations": iters,
        "iter_times": [round(t, 2) for t in times],
        "seconds": round(sum(times), 3),
        "median_iter_sec": round(med, 3),
        # steady-state floor: interference (hypervisor neighbors, GC, JIT
        # stragglers) only ever ADDS time, so the fastest iteration is the
        # cleanest estimate of the engine's true per-iteration cost
        "min_iter_sec": round(min(times), 3),
        "iters_per_sec": round(1.0 / med, 4),
        "edges_per_sec": round(nnz / med, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
