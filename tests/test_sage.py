"""GraphSAGE-style neighbor sampling — pure-Python replay differential on
seeded random graphs, plus the without-replacement / fanout-bound
properties."""

import random

from graph_python_spark.algorithms import neighbor_sample
from graph_python_spark.algorithms.walks import _MOD, _P1, _P2, _P3


def edge_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "i long, j long")


def py_sample(pairs, seeds, fanouts):
    adj = {}
    for a, b in set(pairs):
        adj.setdefault(a, []).append(b)
    frontier = sorted(set(seeds))
    rows = set()
    for layer, fanout in enumerate(fanouts, start=1):
        nxt = set()
        for src in frontier:
            nbrs = sorted(
                adj.get(src, []),
                key=lambda d: ((layer * _P2 + src * _P3 + d * _P1) % _MOD, d))
            for dst in nbrs[:fanout]:
                rows.add((layer, src, dst))
                nxt.add(dst)
        frontier = sorted(nxt)
    return rows


def test_neighbor_sample_differential(spark):
    rng = random.Random(5)
    pairs = list({(rng.randrange(50), rng.randrange(50)) for _ in range(400)})
    pairs = [(a, b) for a, b in pairs if a != b]
    seeds = [0, 1, 2, 3]
    got = {(r["layer"], r["src"], r["dst"])
           for r in neighbor_sample(
               edge_df(spark, pairs),
               spark.createDataFrame([(s,) for s in seeds], "id long"),
               fanouts=[4, 2]).collect()}
    assert got == py_sample(pairs, seeds, [4, 2])


def test_neighbor_sample_bounds(spark):
    rng = random.Random(9)
    pairs = [(a, b) for a, b in
             {(rng.randrange(30), rng.randrange(30)) for _ in range(300)}
             if a != b]
    out = neighbor_sample(
        edge_df(spark, pairs),
        spark.createDataFrame([(0,), (1,)], "id long"),
        fanouts=[3, 3]).collect()
    rows = [(r["layer"], r["src"], r["dst"]) for r in out]
    assert len(rows) == len(set(rows))  # without replacement
    from collections import Counter
    per_src = Counter((r[0], r[1]) for r in rows)
    assert max(per_src.values()) <= 3  # fanout bound per (layer, src)
