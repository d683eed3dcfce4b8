"""Differential tests for IC-model Monte-Carlo influence spread vs a pure
Python replay of the deterministic affine-mod edge coin."""

import random

from graph_python_spark.algorithms.influence import influence_spread

MOD, P1 = 1000000007, 1000003


def _coin(i, j, t, salt):
    h1 = (i * P1 + salt) % MOD
    h2 = (h1 * P1 + j) % MOD
    h3 = (h2 * P1 + t) % MOD
    h4 = (h3 * P1 + 99991) % MOD
    return (h4 + 1) / MOD


def _replay(pairs, seeds, p, samples, rounds, salt):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
    out = {}
    for t in range(samples):
        reached = set(seeds)
        frontier = set(seeds)
        for _ in range(rounds):
            nxt = {j for i in frontier for j in adj.get(i, [])
                   if _coin(i, j, t, salt) <= p and j not in reached}
            if not nxt:
                break
            reached |= nxt
            frontier = nxt
        out[t] = len(reached)
    return out


def _rand_graph(n=40, m=200, seed=21):
    rng = random.Random(seed)
    return sorted({(rng.randrange(n), rng.randrange(n))
                   for _ in range(m)} - {(i, i) for i in range(n)})


def test_influence_vs_replay(spark):
    pairs = _rand_graph()
    e = spark.createDataFrame(pairs, "i long, j long")
    seeds = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    for p, s, r in [(0.3, 6, 4), (0.05, 3, 2), (1.0, 2, 3)]:
        got = {row.sample: row.reached for row in
               influence_spread(e, seeds, p=p, samples=s, rounds=r,
                                salt=101).collect()}
        assert got == _replay(pairs, [0, 1, 2], p, s, r, 101), (p, s, r)


def test_influence_p_monotone(spark):
    # more liveness -> reach can only grow, sample by sample (the live-edge
    # sets are nested in p because the coin is shared)
    pairs = _rand_graph(seed=22)
    e = spark.createDataFrame(pairs, "i long, j long")
    seeds = spark.createDataFrame([(5,)], "id long")
    lo = {r.sample: r.reached for r in
          influence_spread(e, seeds, p=0.1, samples=4, rounds=5).collect()}
    hi = {r.sample: r.reached for r in
          influence_spread(e, seeds, p=0.6, samples=4, rounds=5).collect()}
    for t in lo:
        assert hi[t] >= lo[t]


def test_influence_p1_reaches_forward_set(spark):
    # p = 1 with enough rounds == plain BFS reachability from the seeds
    pairs = [(0, 1), (1, 2), (2, 3), (5, 6)]
    e = spark.createDataFrame(pairs, "i long, j long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r.sample: r.reached for r in
           influence_spread(e, seeds, p=1.0, samples=2, rounds=10).collect()}
    assert got == {0: 4, 1: 4}
