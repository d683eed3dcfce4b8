"""Differential tests for TrustRank / spam mass vs a dense NumPy oracle
(pagerank_3f conventions: binarized edges, dangling mass drops, teleport
(1-d)·p with p the seed distribution)."""

import random

import numpy as np

from graph_python_spark.algorithms.trustrank import spam_mass, trustrank_fixed


def edge_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "i long, j long")


def rand_graph(n=40, m=160, seed=12):
    rng = random.Random(seed)
    return sorted({(rng.randrange(n), rng.randrange(n))
                   for _ in range(m)} - {(i, i) for i in range(n)})


def dense_seeded(pairs, n, p, iters, d=0.85):
    A = np.zeros((n, n))
    for a, b in pairs:
        A[a, b] = 1.0
    deg = A.sum(1)
    T = np.divide(A, deg[:, None], out=np.zeros_like(A), where=deg[:, None] > 0)
    r = p.copy()
    for _ in range(iters):
        r = (1 - d) * p + d * (T.T @ r)
    return r


def test_trustrank_vs_numpy(spark):
    pairs = rand_graph()
    n = max(max(p) for p in pairs) + 1
    seeds = [0, 3, 7]
    p = np.zeros(n)
    p[seeds] = 1.0 / len(seeds)
    for iters in (1, 4, 9):
        got = {r["id"]: r["score"] for r in trustrank_fixed(
            edge_df(spark, pairs),
            spark.createDataFrame([(s,) for s in seeds], "id long"),
            iterations=iters).collect()}
        exp = dense_seeded(pairs, n, p, iters)
        for v in range(n):
            assert np.isclose(got.get(v, 0.0), exp[v], atol=1e-12), (iters, v)


def test_spam_mass_vs_numpy(spark):
    pairs = rand_graph(seed=13)
    n = max(max(p) for p in pairs) + 1
    seeds = [1, 2]
    iters = 8
    rows = {r["id"]: r for r in spam_mass(
        edge_df(spark, pairs),
        spark.createDataFrame([(s,) for s in seeds], "id long"),
        iterations=iters).collect()}
    p_pr = np.full(n, 1.0 / n)
    p_core = np.zeros(n)
    p_core[seeds] = 1.0 / n
    exp_pr = dense_seeded(pairs, n, p_pr, iters)
    exp_core = dense_seeded(pairs, n, p_core, iters)
    assert set(rows) == set(range(n))  # pr is dense over all vertices
    for v in range(n):
        assert np.isclose(rows[v]["pr"], exp_pr[v], atol=1e-12)
        assert np.isclose(rows[v]["core_pr"], exp_core[v], atol=1e-12)
        assert np.isclose(rows[v]["spam_mass"],
                          (exp_pr[v] - exp_core[v]) / exp_pr[v], atol=1e-9)
        assert 0.0 <= rows[v]["spam_mass"] < 1.0  # core-biased PR' <= PR


def test_spam_mass_flags_spam_farm(spark):
    # good core 0->1->2->0 (trusted {0,1}); farm 3<->4 boosting 5
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (3, 5), (4, 5), (2, 5)]
    rows = {r["id"]: r["spam_mass"] for r in spam_mass(
        edge_df(spark, pairs),
        spark.createDataFrame([(0,), (1,)], "id long"),
        iterations=30).collect()}
    # farm vertices are unreachable from the core: full spam mass
    assert rows[3] > 0.99 and rows[4] > 0.99
    # core vertices keep most of their rank from the core
    assert rows[0] < 0.5 and rows[1] < 0.5 and rows[2] < 0.5
    # the boosted target sits in between (mixed core + farm inflow)
    assert rows[2] < rows[5] < rows[3]
