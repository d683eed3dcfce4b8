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
