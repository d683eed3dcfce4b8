"""Louvain (synchronous modularity-greedy) — determinism, modularity
improvement, contraction levels, and a NumPy re-implementation oracle of
the same synchronous rule."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_python_spark.algorithms.louvain import (
    louvain_levels,
    louvain_sweeps,
    modularity,
)

# the notebook's 7-vertex demo graph (Louvain.ipynb cell 7)
ADJ7 = np.array(
    [
        [0, 1, 0, 1, 1, 0, 0],
        [1, 0, 0, 1, 1, 0, 0],
        [0, 0, 0, 0, 1, 1, 1],
        [1, 1, 0, 0, 1, 0, 0],
        [1, 1, 1, 1, 0, 0, 0],
        [0, 0, 1, 0, 0, 0, 1],
        [0, 0, 1, 0, 0, 1, 0],
    ]
)


def _edges_df(spark, m):
    rows = [(i, j, float(m[i, j])) for i in range(m.shape[0])
            for j in range(m.shape[1]) if m[i, j]]
    return spark.createDataFrame(rows, "i long, j long, v double")


def _numpy_sync_louvain(m, sweeps):
    """The same synchronous rule in dense numpy: argmax over neighbor
    communities of kvc - k_v*(sig_c - [c==cv]k_v)/m2, ties to smallest c."""
    n = m.shape[0]
    w = (m + m.T) / 1.0
    np.fill_diagonal(w, 0.0)
    k = w.sum(axis=1)
    m2 = w.sum()
    c = np.arange(n)
    for s in range(sweeps):
        sig = np.zeros(n)
        np.add.at(sig, c, k)
        new_c = c.copy()
        for v in range(n):
            if v % 2 != s % 2:
                continue  # parity alternation matches louvain_sweeps
            cands = {}
            for u in range(n):
                if w[v, u]:
                    cands[c[u]] = cands.get(c[u], 0.0) + w[v, u]
            if not cands:
                continue
            cands.setdefault(c[v], 0.0)  # staying is always a candidate
            best, best_score = None, None
            for cn in sorted(cands):
                score = cands[cn] - k[v] * (sig[cn] - (k[v] if cn == c[v] else 0.0)) / m2
                if best_score is None or score > best_score:
                    best, best_score = cn, score
            new_c[v] = best
        c = new_c
    return c


def test_louvain_matches_numpy_oracle(spark):
    got = {r["id"]: r["community"]
           for r in louvain_sweeps(_edges_df(spark, ADJ7), sweeps=4).collect()}
    want = _numpy_sync_louvain(ADJ7, 4)
    assert got == {i: int(want[i]) for i in range(7)}


def test_louvain_improves_modularity(spark):
    e = _edges_df(spark, ADJ7)
    lab = louvain_sweeps(e, sweeps=4)
    ident = e.select(F.col("i").alias("id"), F.col("i").alias("community")).distinct()
    q0 = modularity(e, ident)
    q1 = modularity(e, lab)
    assert q1 > q0
    # notebook's common solutions reach Q ~ 0.34-0.39 on this graph
    assert q1 > 0.3


def test_louvain_deterministic(spark):
    e = _edges_df(spark, ADJ7)
    a = sorted(map(tuple, louvain_sweeps(e, sweeps=3).collect()))
    b = sorted(map(tuple, louvain_sweeps(e, sweeps=3).collect()))
    assert a == b


def test_louvain_levels_contract(spark):
    e = _edges_df(spark, ADJ7)
    levels = louvain_levels(e, sweeps=4, max_levels=3)
    assert len(levels) >= 1
    # community count shrinks below vertex count and labels cover all ids
    assert levels[0].n_communities < 7
    assert {r["id"] for r in levels[-1].labels.collect()} == set(range(7))
    # modularity non-decreasing across levels
    for a, b in zip(levels, levels[1:]):
        assert b.modularity >= a.modularity - 1e-12


def _ring_of_cliques(spark, n_cliques=8, size=5):
    """The classic Louvain fixture: k cliques joined in a ring by single
    bridge edges.  Its modularity optimum groups each clique; critically,
    the CONTRACTED graph (one super-vertex per clique, internal weight as
    self-loops) is a local optimum — no further merge improves Q — so it
    exercises exactly the two contraction bugs fixed here: self-loop
    weight must enter degrees/m2, and "stay" must always be a candidate
    (a super-vertex alone in its community must not be forced into its
    best neighbor community at negative gain)."""
    rows = []
    for c in range(n_cliques):
        base = c * size
        for a in range(size):
            for b in range(a + 1, size):
                rows.append((base + a, base + b, 1.0))
        rows.append((base, ((c + 1) % n_cliques) * size + 1, 1.0))
    return spark.createDataFrame(rows, "i long, j long, v double")


def test_louvain_levels_ring_of_cliques(spark):
    K, S = 8, 5
    e = _ring_of_cliques(spark, K, S)
    levels = louvain_levels(e, sweeps=4, max_levels=4)
    # level 0 recovers the planted cliques exactly
    lab = {r["id"]: r["community"] for r in levels[0].labels.collect()}
    assert levels[0].n_communities == K
    for c in range(K):
        assert len({lab[c * S + m] for m in range(S)}) == 1
    # the contracted ring is a local optimum: no further merging, the
    # level loop terminates (no shrink => break), and Q never degrades
    assert levels[-1].n_communities == K
    assert len(levels) <= 2
    for a, b in zip(levels, levels[1:]):
        assert b.modularity >= a.modularity - 1e-12
    # Q at the optimum of a ring of cliques: 1 - 1/k - (intra-degree
    # bookkeeping); just pin the measured stable value
    assert abs(levels[0].modularity - 0.7841) < 5e-4
