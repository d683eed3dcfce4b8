"""Deterministic random-walk sampling over the directed edge table — the
walk corpus generator for embedding-style training data (DeepWalk /
node2vec first-order walks).

Determinism contract: the step-t choice from vertex v on walk w is
neighbor rank  ((w·1000003 + t·10007 + v·31) mod 1000000007) mod deg(v)
with neighbors ranked by destination id.  Pure 64-bit integer arithmetic —
replayable bit-identically in any SQL engine (the DuckDB oracle unrolls
the same K steps), across partitionings, and across reruns; no RNG state.

Spark shape (scale path): the ranked adjacency (src, rank, dst, deg) is
built ONCE with a per-src window (partition-parallel — src-hash
partitioned, never a global window) and cached.  Each step joins the
frontier — O(#walks) rows, tiny next to E — against it; the frontier side
is explicitly broadcast, so a step is one map-side hash join with NO
shuffle of the adjacency.  Walks stop early at sinks (no out-edges).
A 10-step walk over 10^5 seeds on a 10^10-edge graph therefore moves
10 × 10^5 rows, not 10 × E.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_P1, _P2, _P3, _MOD = 1000003, 10007, 31, 1000000007


def ranked_adjacency(edges: DataFrame) -> DataFrame:
    """(src, rank, dst, deg): neighbors of each src ranked 0..deg-1 by
    ascending dst over the deduped directed edge set."""
    e = edges.select(F.col("i").alias("src"), F.col("j").alias("dst")).distinct()
    w = Window.partitionBy("src").orderBy("dst")
    return e.select(
        "src",
        (F.row_number().over(w) - 1).cast("long").alias("rank"),
        "dst",
        F.count("*").over(Window.partitionBy("src")).cast("long").alias("deg"),
    )


def node2vec_walks(
    edges: DataFrame,
    seeds: DataFrame,
    steps: int = 6,
    return_w: int = 2,
    inout_w: int = 1,
    stay_w: int = 4,
) -> DataFrame:
    """Second-order (node2vec-style) biased walks, fully deterministic.

    node2vec (Grover & Leskovec 2016) biases step t by where candidate x
    stands relative to the PREVIOUS vertex: α = 1/p if x == prev (return),
    1 if x ∈ Γ(prev) (stay in the neighborhood), 1/q otherwise (explore).
    Here the α-weighted categorical draw is replaced by a deterministic,
    engine-replayable pick: each candidate scores
    ``weight · hash64(walk, t, v, x)`` with INTEGER weights
    (``return_w``/``stay_w``/``inout_w`` — the α ratios ×LCM, so p=2, q=4
    defaults map to 2/4/1) and the candidate with the LARGEST score wins
    (ties by larger x).  Higher-weight candidates win proportionally more
    hash draws, preserving node2vec's return/explore structure, and the
    pure int64 arithmetic replays bit-identically in any SQL engine —
    the same determinism contract as `deterministic_walks`.
    Step 1 has no prev and is the uniform first-order pick.
    Returns (walk, step, v) including step 0; walks stop early at sinks.

    Spark shape: per step, the O(#walks)-row frontier broadcasts into the
    cached ranked adjacency (candidate generation, no shuffle); the
    membership of x in Γ(prev) is resolved by broadcasting the candidate
    (prev, x) pairs back into the SAME cached adjacency (a second scan, no
    shuffle, no per-vertex arrays — hub-safe: nothing ever materializes a
    whole neighbor list in one cell); then one groupBy(walk) argmax —
    O(Σ deg(frontier)) shuffled rows per step, never O(E).
    """
    adj = ranked_adjacency(edges).cache()
    state = seeds.select(
        F.col("id").cast("long").alias("walk"),
        F.lit(0).cast("long").alias("step"),
        F.col("id").cast("long").alias("v"),
        F.lit(None).cast("long").alias("prev"),
    )
    out = [state.select("walk", "step", "v")]
    # step 1: uniform first-order pick (no prev yet)
    pick1 = ((F.col("walk") * _P1 + F.lit(1) * _P2 + F.col("v") * _P3) % _MOD) % F.col("deg")
    state = (
        F.broadcast(state.select("walk", "v"))
        .join(adj, F.col("v") == F.col("src"))
        .filter(F.col("rank") == pick1)
        .select("walk", F.lit(1).cast("long").alias("step"),
                F.col("dst").alias("v"), F.col("v").alias("prev"))
    )
    out.append(state.select("walk", "step", "v"))
    adj_pairs = adj.select(F.col("src").alias("prev"), F.col("dst").alias("x"))
    for t in range(2, steps + 1):
        cand = (
            F.broadcast(state.select("walk", "v", "prev"))
            .join(adj, F.col("v") == F.col("src"))
            .select("walk", "v", "prev", F.col("dst").alias("x"))
        )
        # membership x ∈ Γ(prev): the candidate pairs broadcast back into
        # the cached adjacency (build side = candidates, stream side = the
        # in-memory edge pairs) — (walk, x) is unique within a step, so the
        # inner-join hits ARE the stay set
        stay = (
            F.broadcast(cand.select("walk", "prev", "x"))
            .join(adj_pairs, ["prev", "x"])
            .select("walk", "x", F.lit(1).alias("_stay"))
        )
        cand = (
            cand.join(F.broadcast(stay), ["walk", "x"], "left")
            .select(
                "walk", "v", "prev", "x",
                F.when(F.col("x") == F.col("prev"), F.lit(return_w))
                .when(F.col("_stay") == 1, F.lit(stay_w))
                .otherwise(F.lit(inout_w)).alias("w"),
            )
        )
        key = (
            F.col("w")
            * ((F.col("walk") * _P1 + F.lit(t) * _P2 + F.col("v") * _P3
                + F.col("x") * _P1) % _MOD)
        )
        state = (
            cand.withColumn("key", key)
            .groupBy("walk")
            .agg(F.max(F.struct(F.col("key"), F.col("x"))).alias("m"),
                 F.first("v").alias("prev_v"))
            .select("walk", F.lit(t).cast("long").alias("step"),
                    F.col("m.x").alias("v"), F.col("prev_v").alias("prev"))
        )
        if t % 4 == 0:
            state = state.localCheckpoint(eager=True)
        out.append(state.select("walk", "step", "v"))
    return reduce(lambda a, b: a.unionByName(b), out)


def deterministic_walks(
    edges: DataFrame,
    seeds: DataFrame,
    steps: int = 8,
) -> DataFrame:
    """One walk per seed vertex (walk id = seed id), ``steps`` hops or
    until a sink.  Returns (walk, step, v) including step 0 at the seed.

    ``seeds``: DataFrame with a long column ``id``.
    """
    adj = ranked_adjacency(edges).cache()
    state = seeds.select(
        F.col("id").cast("long").alias("walk"),
        F.lit(0).cast("long").alias("step"),
        F.col("id").cast("long").alias("v"),
    )
    out = [state]
    for t in range(1, steps + 1):
        pick = (
            ((F.col("walk") * _P1 + F.lit(t) * _P2 + F.col("v") * _P3) % _MOD)
            % F.col("deg")
        )
        state = (
            F.broadcast(state.select("walk", "v"))
            .join(adj, F.col("v") == F.col("src"))
            .filter(F.col("rank") == pick)
            .select(
                "walk",
                F.lit(t).cast("long").alias("step"),
                F.col("dst").alias("v"),
            )
        )
        if t % 4 == 0:
            state = state.localCheckpoint(eager=True)
        out.append(state)
    return reduce(lambda a, b: a.unionByName(b), out)


def walk_skipgrams(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram training pairs from a walk corpus (DeepWalk/node2vec's
    sampling step): for every walk, emit (center, context) for each pair
    of positions at distance 1..``window``, aggregated to co-occurrence
    counts — the input an embedding trainer consumes.

    ``walks``: (walk, step, v) as produced by ``deterministic_walks`` /
    ``node2vec_walks``.  Returns (center, context, pair_count), directed
    (both orders emitted, like word2vec's symmetric context).

    Plan: ONE self-join on the walk id with the |step gap| ≤ window
    band predicate — per-walk fan-out is bounded by steps×2·window (tiny
    and constant), so the joined relation is O(|walks| · steps · window),
    never quadratic in the corpus; then one groupBy on the pair key with
    map-side combine.  No windows, no collect.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    a = walks.select(F.col("walk"), F.col("step").alias("sa"),
                     F.col("v").alias("center"))
    b = walks.select(F.col("walk"), F.col("step").alias("sb"),
                     F.col("v").alias("context"))
    gap = F.col("sb") - F.col("sa")
    return (
        a.join(b, "walk")
        .filter((gap != 0) & (F.abs(gap) <= window))
        .groupBy("center", "context")
        .agg(F.count("*").cast("long").alias("pair_count"))
    )


def neighbor_sample(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: list[int] = (5, 3),
) -> DataFrame:
    """GraphSAGE-style layered neighbor sampling (Hamilton et al. 2017) —
    the minibatch-block builder for GNN training over a link graph.

    Layer l (1-based) samples up to ``fanouts[l-1]`` out-neighbors,
    without replacement, for every vertex in that layer's frontier; the
    layer-(l+1) frontier is the distinct sampled destinations.  Returns
    (layer long, src long, dst long).

    Determinism contract (same family as the walks above): the sample of
    src's neighborhood at layer l is the ``fanout`` smallest neighbors
    under the integer key  ((l·P2 + src·P3 + dst·P1) mod MOD, dst)  —
    pure 64-bit arithmetic, bit-replayable by any SQL engine, invariant
    to partitioning and ordering.

    Plan shape (100 TB): the frontier — O(seeds · Π fanouts) rows, tiny
    next to E — is explicitly broadcast into a hash join against the
    deduped edge table, so each layer shuffles only the joined
    frontier-neighborhood relation through one src-partitioned window
    rank (never a global window, never the full adjacency).  Layers are
    sequential; total exchanged rows ≈ Σ frontier_l · avg_deg.
    """
    e = edges.select(F.col("i").alias("src"),
                     F.col("j").alias("dst")).distinct()
    frontier = seeds.select(F.col("id").cast("long").alias("src")).distinct()
    out = []
    for layer, fanout in enumerate(fanouts, start=1):
        key = (F.lit(layer) * _P2 + F.col("src") * _P3
               + F.col("dst") * _P1) % _MOD
        w = Window.partitionBy("src").orderBy(key.asc(), F.col("dst").asc())
        picked = (
            F.broadcast(frontier)
            .join(e, "src")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= fanout)
            .select(F.lit(layer).cast("long").alias("layer"), "src", "dst")
            .localCheckpoint(eager=True)
        )
        out.append(picked)
        frontier = picked.select(F.col("dst").alias("src")).distinct()
    return reduce(lambda a, b: a.unionByName(b), out)
