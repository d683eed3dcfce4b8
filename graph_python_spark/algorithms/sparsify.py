"""Deterministic graph sparsification.

At 100 TB the expensive algorithms (betweenness, walks, embeddings) are
often run on a degree-bounded sketch of the graph rather than the raw
edge set.  ``sparsify_by_degree`` keeps each edge (i, j) independently
with probability min(1, c / deg_out(i)) — the classic degree-proportional
thinning that caps expected out-degree at ~c while keeping low-degree
structure intact (hubs are downsampled, leaves untouched).

Scale shape: one map-side-combined degree aggregation on src + one
equi-join of the edge relation with the O(V) degree relation (broadcast
when small, shuffled hash join at scale — both sides hash on src, AQE
picks), then a pure row-local filter.  The keep decision uses the house
affine-mod-prime unit hash of (src, dst) — exact integer arithmetic, so
the sketch is a pure function of the edge set: reproducible across
partitionings, cluster sizes, and engines (the DuckDB oracle replays it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P1 = 1000003
_P2 = 10007
_MOD = 1000000007


def sparsify_by_degree(edges: DataFrame, target_degree: int,
                       salt: int = 41) -> DataFrame:
    """edges: (i, j) distinct directed edges.  Returns the kept subset.

    keep(i, j)  <=>  u(i, j) * deg_out(i) < target_degree, with
    u = ((i*P1 + j*P2 + salt) mod M + 1) / M in (0, 1].  Vertices with
    deg_out < target_degree keep every edge (u*deg <= deg < c); hubs keep
    an expected ~target_degree sample of theirs.
    """
    deg = edges.groupBy("i").agg(F.count("*").alias("_deg"))
    # two affine rounds: one round leaves u proportional to the key when
    # (i*P1 + j*P2) is small relative to M; the second multiply wraps the
    # modulus even for tiny keys.  Intermediates < 1e15 << 2^63: exact.
    h1 = (F.col("i") * _P1 + F.col("j") * _P2 + F.lit(salt)) % _MOD
    h2 = (h1 * _P1 + F.lit(99991)) % _MOD
    u = (h2 + 1).cast("double") / F.lit(float(_MOD))
    return (
        edges.join(deg, "i")
        .filter(u * F.col("_deg") < F.lit(float(target_degree)))
        .select("i", "j")
    )
