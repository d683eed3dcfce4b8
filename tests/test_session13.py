"""Round-3 session-13 operators: SCC condensation DAG and HyperBall
harmonic centrality — seeded-random differentials vs networkx."""

import random

import networkx as nx
import pytest

from graph_python_spark.algorithms.anf import hyperball_harmonic
from graph_python_spark.algorithms.scc import condensation


def edge_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "i long, j long")


def random_digraph(seed, n=60, m=150):
    rng = random.Random(seed)
    return {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}


def nx_condensation(pairs, level_rounds):
    G = nx.DiGraph()
    G.add_edges_from((a, b) for a, b in pairs if a != b)
    comp_of = {}
    comps = {}
    for c in nx.strongly_connected_components(G):
        key = min(c)
        comps[key] = c
        for v in c:
            comp_of[v] = key
    q = nx.DiGraph()
    q.add_nodes_from(comps)
    for a, b in G.edges:
        ca, cb = comp_of[a], comp_of[b]
        if ca != cb:
            q.add_edge(ca, cb)
    level = {c: 0 for c in q.nodes}
    for c in nx.topological_sort(q):
        for s in q.successors(c):
            level[s] = max(level[s], level[c] + 1)
    assert max(level.values(), default=0) <= level_rounds
    return {
        c: (len(comps[c]), level[c], q.out_degree(c)) for c in comps
    }


@pytest.mark.parametrize("seed", [7, 8])
def test_condensation_vs_networkx(spark, seed):
    pairs = random_digraph(seed)
    got = {
        r["component"]: (r["n_members"], r["level"], r["out_comps"])
        for r in condensation(edge_df(spark, pairs), level_rounds=16).collect()
    }
    # nx_condensation drops self-loops and never sees vertices with no
    # real edge — the same relation the Spark side operates on
    want = nx_condensation(pairs, 16)
    assert got == want


def test_hyperball_exact_when_unsaturated(spark):
    """k larger than any ball ⇒ the estimate is the exact ball size and
    the result equals the exact truncated harmonic centrality."""
    pairs = random_digraph(11, n=40, m=90)
    radius = 3
    e = edge_df(spark, pairs)
    got = {r["id"]: r["harmonic"]
           for r in hyperball_harmonic(e, radius=radius, k=512,
                                       reverse=True).collect()}
    G = nx.DiGraph()
    G.add_edges_from((a, b) for a, b in pairs if a != b)
    for v in G.nodes:
        exact = 0.0
        for u, d in nx.single_source_shortest_path_length(
                G.reverse(copy=False), v, cutoff=radius).items():
            if d > 0:
                exact += 1.0 / d
        assert got[v] == pytest.approx(exact, abs=2e-6)


def test_hyperball_saturated_is_partitioning_invariant(spark):
    """k=8 saturates on a dense graph; the estimate must be a pure
    function of the input — identical across partitioning layouts."""
    pairs = random_digraph(13, n=50, m=400)
    e1 = edge_df(spark, pairs)
    e2 = edge_df(spark, sorted(pairs)).repartition(7)
    a = {r["id"]: r["harmonic"]
         for r in hyperball_harmonic(e1, radius=2, k=8).collect()}
    b = {r["id"]: r["harmonic"]
         for r in hyperball_harmonic(e2, radius=2, k=8).collect()}
    assert a == b
    assert all(v >= 0 for v in a.values())
