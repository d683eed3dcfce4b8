"""PageRank — iterated plus_second SpMV, LAGraph `pagerank_3f` semantics.

Reference recipe (``/root/reference/notebooks/Pagerank Demo.ipynb`` cell 9):

    teleport = (1 - damping) / n ;  r = 1/n (dense)
    d = d_out / damping                      # only vertices with out-edges
    loop until rdiff <= tol:
        w = t ⊘ d                            # ewise_mult ⇒ INTERSECTION:
                                             #   dangling vertices drop out,
                                             #   they contribute teleport only
        r = teleport  (dense)
        r += Aᵀ·w  over plus_second          # sum of w over in-neighbors
        rdiff = sum |t - r|                  # L1 convergence

Spark shape — the loop iterates on the SPARSE contribution vector only
(r is never materialized densely inside the loop), over a CACHED ADJACENCY
table rather than the raw edge list:

    adj      = (i, js: array<long>, inv_d)        built once, hash(i), cached
    w_k      = (teleport + contrib_k) ⊙ inv_d     adj ⋈ contrib on i — O(V) probe
    contrib' = Σ explode(js) w_k                  explode + groupBy(dst)

  * identical arithmetic to the dense recipe: r_k = teleport + contrib_k
    (vertices with no in-edges sit at teleport and, if dangling, never feed
    back); the dense r materializes once, after the loop;
  * the adjacency form collapses A = one(A) binarization, out-degree, and
    src-partitioning into ONE prep shuffle (groupBy(i).collect_set), and the
    per-iteration join probes V adjacency rows instead of E edge rows — the
    O(E) fan-out happens inline via explode in the same whole-stage-codegen
    span as the partial aggregation (measured 4× over the edge-join loop at
    57M edges; scaling efficiency local[8]→local[32] ≈ 1.0 vs 0.72);
  * contrib comes out of groupBy hash-partitioned by i with the same
    partition count as adj, so the join needs no exchange on either side;
    the one irreducible shuffle is the O(distinct-dst) partial-agg exchange;
  * lineage is truncated by localCheckpoint every ``checkpoint_every``
    iterations (old state unpersisted), or durably via IterationState for
    the north-rule resume guarantee;
  * rdiff = Σ|contrib' - contrib| exactly (the dense teleport terms cancel).

At 1000-executor / 100 TB scale the plan holds: the adjacency table stays
partitioned by src across iterations (per-row arrays bounded by max degree;
a hub row's explode is one task's sequential scan), the rank vector is the
only moving state, and power-law dst skew is handled by map-side partial
aggregation plus the salted two-stage combine in ``operators/blocks.py``
(⊕ associativity makes partial merges exact).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_python_spark.plans.iterate import (IterationState, loop_conf,
                                                loop_shuffle_width)


class _Pinned:
    """Rotating localCheckpoint holder: pin new state, unpersist the old."""

    def __init__(self):
        self.prev: Optional[DataFrame] = None

    def pin(self, df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        if self.prev is not None:
            try:
                self.prev.unpersist()
            except Exception:
                pass
        self.prev = out
        return out


@dataclass
class PreparedGraph:
    """Loop-invariant PageRank state, built once per job: the cached
    adjacency table (with damping baked into inv_d), the vertex set, and
    its count.  Build with :func:`prepare_graph`; pass to ``pagerank`` /
    ``pagerank_fixed`` via ``prepared=`` to amortize the one-time build
    across runs (and to time the iteration loop alone, BASELINE.md)."""

    adj: DataFrame        # (i, js: array<long>, inv_d: double), hash(i), cached
    vertices: DataFrame   # (id: long), cached
    n: int
    damping: float


def _prepare(edges: DataFrame, vertices: Optional[DataFrame], damping: float,
             partitions: Optional[int]):
    """Build the cached adjacency table (A = one(A): arrays deduped), the
    vertex set, and per-row damping/out-degree.  The array build runs in
    numpy over Arrow batches (operators/blocks.adjacency_table) — 3× faster
    than collect_set at 57M edges."""
    from graph_python_spark.operators.blocks import adjacency_table

    e = edges.select(F.col("i"), F.col("j"))
    # deg (not size(js)): hub rows may be segmented into several bounded
    # chunks, each carrying the vertex's TOTAL out-degree
    adj = adjacency_table(e, "i", "j", partitions).select(
        F.col("s").alias("i"), F.col("ds").alias("js"),
        (F.lit(damping) / F.col("deg")).alias("inv_d"),
    )
    if vertices is None:
        vertices = (
            e.select(F.col("i").alias("id"))
            .unionByName(e.select(F.col("j").alias("id")))
            .distinct()
        )
    vertices = vertices.select("id").cache()
    n = vertices.count()
    adj.count()
    return adj, vertices, n


def prepare_graph(edges: DataFrame, vertices: Optional[DataFrame] = None,
                  damping: float = 0.85,
                  partitions: Optional[int] = None) -> PreparedGraph:
    """Materialize the loop-invariant state (adjacency + vertices) once."""
    adj, vertices, n = _prepare(edges, vertices, damping, partitions)
    return PreparedGraph(adj, vertices, n, damping)


def _step(adj, teleport: float, r0: float, contrib: Optional[DataFrame]) -> DataFrame:
    """One pagerank_3f SpMV step: w = (teleport + contrib) ⊙ inv_d on adj's
    domain, then contrib' = Σ_{i→j} w[i] (explode + partial-agg groupBy).
    contrib=None is the first step from the dense uniform r0."""
    if contrib is None:
        src = adj.select((F.lit(r0) * F.col("inv_d")).alias("w"), "js")
    else:
        src = (
            adj.join(contrib, "i", "left_outer")
            .select(((F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0)))
                     * F.col("inv_d")).alias("w"), "js")
        )
    return (
        src.select(F.explode("js").alias("i"), "w")
        .groupBy("i")
        .agg(F.sum("w").alias("c"))
    )


def _contrib_loop(adj, teleport, r0, iterations, pinned, contrib=None,
                  rdiff_cb=None, tol=None, step_fn=None):
    """Shared iteration body — the ONE place the pin cadence / lineage
    truncation lives.  contrib=None means start from dense r0=1/n;
    ``step_fn`` overrides the default unweighted SpMV step (used by the
    weighted variant) while keeping the identical loop mechanics."""
    if step_fn is None:
        def step_fn(c):
            return _step(adj, teleport, r0, c)
    iters_done = 0
    for k in range(iterations):
        new_contrib = step_fn(contrib)
        if rdiff_cb is not None:
            new_contrib = pinned.pin(new_contrib)
            rdiff = rdiff_cb(contrib, new_contrib, k)
            contrib = new_contrib
            iters_done = k + 1
            if tol is not None and rdiff <= tol:
                break
        else:
            # fixed-iteration mode: truncate lineage only every few rounds
            if (k + 1) % 3 == 0 or k == iterations - 1:
                new_contrib = pinned.pin(new_contrib)
            contrib = new_contrib
            iters_done = k + 1
    return contrib, iters_done


def _finalize(vertices, contrib, teleport) -> DataFrame:
    return (
        vertices.select(F.col("id").alias("i"))
        .join(contrib, "i", "left_outer")
        .select(F.col("i").alias("id"),
                (F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0))).alias("score"))
    )


def pagerank(
    edges: DataFrame,
    vertices: Optional[DataFrame] = None,
    damping: float = 0.85,
    tol: float = 1e-4,
    itermax: int = 100,
    partitions: Optional[int] = None,
    checkpoint: Optional[IterationState] = None,
    checkpoint_every: int = 1,
    prepared: Optional[PreparedGraph] = None,
) -> tuple[DataFrame, int, list[float]]:
    """Run to L1 convergence. Returns (scores(id, score), iters, rdiff trace).

    ``edges``: DataFrame with long columns i (src), j (dst); duplicates OK
    (binarized).  ``checkpoint``: optional durable IterationState — a killed
    run resumes from the last saved iteration with identical results.
    ``prepared``: pre-built loop-invariant state (its baked damping wins).
    """
    if prepared is not None:
        adj, vertices, n, damping = (prepared.adj, prepared.vertices,
                                     prepared.n, prepared.damping)
    else:
        adj, vertices, n = _prepare(edges, vertices, damping, partitions)
    if n == 0:
        empty = edges.sparkSession.createDataFrame([], "id long, score double")
        return empty, 0, []
    teleport = (1.0 - damping) / n

    start_iter = 0
    rdiffs: list[float] = []
    contrib: Optional[DataFrame] = None
    if checkpoint is not None:
        restored = checkpoint.restore()
        if restored is not None:
            start_iter, states, metrics = restored
            contrib = states["contrib"]
            rdiffs = list(metrics.get("rdiffs", []))
            if rdiffs and rdiffs[-1] <= tol:
                return _finalize(vertices, contrib, teleport), start_iter, rdiffs

    pinned = _Pinned()

    def rdiff_cb(old_contrib, new_contrib, k):
        # Σ|r_new - r_old|: teleport cancels; vertices never receiving
        # contributions never change. First iteration diffs against r0=1/n
        # on contribution-receiving vertices, plus the unchanged remainder:
        # matches the dense recipe because r0 is uniform.
        if old_contrib is None:
            # |r1 - r0| = Σ_receiving |tel + c - 1/n| + (n - receiving)·|tel - 1/n|
            row = new_contrib.agg(
                F.sum(F.abs(F.lit(teleport) + F.col("c") - F.lit(1.0 / n))).alias("d"),
                F.count("*").alias("m"),
            ).first()
            rdiff = float(row["d"] or 0.0) + (n - row["m"]) * abs(teleport - 1.0 / n)
        else:
            row = (
                old_contrib.withColumnRenamed("c", "_co")
                .join(new_contrib, "i", "full_outer")
                .agg(F.sum(F.abs(F.coalesce(F.col("c"), F.lit(0.0))
                                 - F.coalesce(F.col("_co"), F.lit(0.0)))).alias("d"))
                .first()
            )
            rdiff = float(row["d"] or 0.0)
        rdiffs.append(rdiff)
        iters_now = start_iter + k + 1
        if checkpoint is not None and iters_now % checkpoint_every == 0:
            checkpoint.save(iters_now, {"contrib": new_contrib},
                            {"rdiffs": rdiffs, "n": n})
        return rdiff

    remaining = itermax - start_iter
    with loop_conf(adj.sparkSession), loop_shuffle_width(adj.sparkSession, n):
        contrib, done = _contrib_loop(
            adj, teleport, 1.0 / n, remaining, pinned, contrib=contrib,
            rdiff_cb=rdiff_cb, tol=tol,
        )
    return _finalize(vertices, contrib, teleport), start_iter + done, rdiffs


def iteration_times(prepared: PreparedGraph, iterations: int = 7,
                    warmups: int = 2) -> list[float]:
    """Steady-state per-iteration wall-clock of the SpMV loop (BASELINE.md
    measurement protocol): each iteration is eagerly materialized
    (localCheckpoint) so the timing covers the full join + explode +
    partial-agg + shuffle + pin cycle; the first ``warmups`` iterations are
    discarded (the first compiles the no-join path, the second the join
    path — whole-stage codegen + JIT).  Report the MEDIAN of the returned
    list: individual iterations spike 2-3× on GC pauses in a single shared
    JVM, which a multi-executor cluster doesn't serialize.
    """
    import time

    adj, n = prepared.adj, prepared.n
    teleport = (1.0 - prepared.damping) / n
    contrib = None
    times: list[float] = []
    ctx = loop_conf(adj.sparkSession)
    ctx.__enter__()
    try:
        for k in range(warmups + iterations):
            t0 = time.time()
            nc = _step(adj, teleport, 1.0 / n, contrib).localCheckpoint(eager=True)
            if contrib is not None:
                # blocking: the default async unpersist lets old checkpoint
                # blocks linger while the next iteration writes new ones —
                # storage pressure + eviction showed up as 2-3x iteration-
                # time variance in the scaling bench
                contrib.unpersist(blocking=True)
            contrib = nc
            if k >= warmups:
                times.append(time.time() - t0)
    finally:
        ctx.__exit__(None, None, None)
    contrib.unpersist()
    return times


def pagerank_fixed(
    edges: DataFrame,
    vertices: Optional[DataFrame] = None,
    damping: float = 0.85,
    iterations: int = 20,
    partitions: Optional[int] = None,
    prepared: Optional[PreparedGraph] = None,
) -> DataFrame:
    """Exactly ``iterations`` pagerank_3f steps, no convergence action —
    deterministic output used by the DuckDB-checked correctness queries."""
    if prepared is not None:
        adj, vertices, n, damping = (prepared.adj, prepared.vertices,
                                     prepared.n, prepared.damping)
    else:
        adj, vertices, n = _prepare(edges, vertices, damping, partitions)
    if n == 0:
        return edges.sparkSession.createDataFrame([], "id long, score double")
    teleport = (1.0 - damping) / n

    pinned = _Pinned()
    with loop_conf(adj.sparkSession), loop_shuffle_width(adj.sparkSession, n):
        contrib, _ = _contrib_loop(adj, teleport, 1.0 / n, iterations, pinned)
    return _finalize(vertices, contrib, teleport)


def pagerank_weighted_fixed(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 20,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Weighted pagerank_3f twin over (i, j, v): transition mass out of a
    vertex splits proportionally to edge weight, p_ij = damping · w_ij /
    Σ_j w_ij — the anchor-count / click-count link-graph variant (the
    reference's pagerank operates on one(A); this is the same semiring
    SpMV with plus_times over the stochastic weights instead).

    Exactly ``iterations`` steps — deterministic, so a fixed SQL unroll
    oracles it.  Plan: the transition-probability edge table is built once
    (dup edges collapsed plus_times-style, one groupBy + one src-key join),
    hash(i)-partitioned and pinned; every iteration then joins the O(V)
    contribution vector to it exchange-free on the edge side and shuffles
    only the O(distinct dst) partial sums.

    Measured ablation (22.9M edges / 4M vertices, local[32]): a weighted
    CSR array loop (``operators/blocks.weighted_adjacency_table`` with
    damping·w/Σw folded in, explode-of-zipped-arrays fan-out) runs the SAME
    ~7-8.6 s/iteration as this edge join — the unweighted loop's 4× array
    win comes from exploding bare long arrays; zipping a weight alongside
    puts a struct in the explode and gives the gain back — while its 18 s
    build never amortizes.  Edge form kept; the weighted adjacency builder
    remains exported for block-level consumers.
    """
    spark = edges.sparkSession
    npart = int(partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.groupBy("i", "j").agg(F.sum("v").alias("w"))
    ow = e.groupBy("i").agg(F.sum("w").alias("ow"))
    trans = (
        e.join(ow, "i")
        .select("i", "j",
                (F.lit(damping) * F.col("w") / F.col("ow")).alias("p"))
        .repartition(npart, "i")
        .localCheckpoint(eager=True)
    )
    vertices = (
        e.select(F.col("i").alias("id"))
        .unionByName(e.select(F.col("j").alias("id")))
        .distinct()
        .cache()
    )
    n = vertices.count()
    if n == 0:
        return spark.createDataFrame([], "id long, score double")
    teleport = (1.0 - damping) / n
    r0 = 1.0 / n

    def step_fn(contrib):
        if contrib is None:
            src = trans.select("j", (F.lit(r0) * F.col("p")).alias("x"))
        else:
            src = trans.join(contrib, "i", "left_outer").select(
                "j",
                ((F.lit(teleport) + F.coalesce(F.col("c"), F.lit(0.0)))
                 * F.col("p")).alias("x"))
        return src.groupBy(F.col("j").alias("i")).agg(F.sum("x").alias("c"))

    pinned = _Pinned()
    with loop_conf(spark), loop_shuffle_width(spark, n):
        contrib, _ = _contrib_loop(None, teleport, r0, iterations, pinned,
                                   step_fn=step_fn)
    out = _finalize(vertices, contrib, teleport)
    trans.unpersist()
    return out


def pagerank_incremental(
    edges: DataFrame,
    init_scores: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Warm-started PageRank: run exactly ``iterations`` pagerank_3f steps
    on ``edges`` starting from ``init_scores`` (id, score) — the
    incremental-recompute primitive for crawl-to-crawl snapshots (pair
    with ``metrics.snapshot_diff``): scores converged on graph@t are a
    far better initial vector for graph@t+Δ than the uniform prior, so a
    handful of iterations recovers convergence instead of dozens.

    Vertices of the new graph absent from ``init_scores`` (new pages)
    enter at the uniform prior 1/n; scores for vertices that left the
    graph are dropped.  With ``init_scores`` = converged scores of the
    SAME graph, the output is a fixpoint (regression-tested).

    Same plan as ``pagerank_fixed``: cached co-partitioned adjacency,
    one O(distinct-dst) shuffle per iteration; the init join is one
    extra O(V) hash join before the loop.
    """
    adj, vertices, n = _prepare(edges, None, damping, partitions)
    if n == 0:
        return edges.sparkSession.createDataFrame([], "id long, score double")
    teleport = (1.0 - damping) / n
    # dedup defensively: a duplicate id in the init frame would duplicate
    # the vertex row through the left join and corrupt every iteration
    init_1 = (init_scores.groupBy("id")
              .agg(F.max("score").alias("_s0")))
    contrib0 = (
        vertices.select(F.col("id").alias("i"))
        .join(init_1.select(F.col("id").alias("i"), "_s0"), "i", "left_outer")
        .select("i", (F.coalesce(F.col("_s0"), F.lit(1.0 / n))
                      - F.lit(teleport)).alias("c"))
    )
    pinned = _Pinned()
    with loop_conf(adj.sparkSession), loop_shuffle_width(adj.sparkSession, n):
        contrib0 = pinned.pin(contrib0)
        contrib, _ = _contrib_loop(adj, teleport, 1.0 / n, iterations, pinned,
                                   contrib=contrib0)
    return _finalize(vertices, contrib, teleport)
