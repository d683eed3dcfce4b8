"""Bow-tie decomposition (Broder web structure) — a hand-built graph with
every region populated, plus a seeded-random differential vs a pure-Python
BFS/SCC oracle (networkx)."""

import random
from collections import deque

import networkx as nx

from graph_python_spark.algorithms import bowtie_decomposition, reach_from


def edge_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "i long, j long")


def nx_bowtie(pairs):
    G = nx.DiGraph()
    G.add_edges_from((a, b) for a, b in pairs if a != b)
    core = max(nx.strongly_connected_components(G),
               key=lambda c: (len(c), -min(c)))
    s = next(iter(core))
    fwd = nx.descendants(G, s) | {s}
    bwd = nx.ancestors(G, s) | {s}
    inn, out = bwd - core, fwd - core
    Gr = G.reverse()

    def reach(g, seeds):
        seen = set(seeds)
        q = deque(seeds)
        while q:
            u = q.popleft()
            for v in g[u]:
                if v not in seen:
                    seen.add(v)
                    q.append(v)
        return seen

    fin = reach(G, inn) if inn else set()
    bout = reach(Gr, out) if out else set()
    return {
        v: ("CORE" if v in core else "IN" if v in inn
            else "OUT" if v in out
            else "TUBE" if (v in fin and v in bout)
            else "TENDRIL" if (v in fin or v in bout)
            else "DISCONNECTED")
        for v in G
    }


# CORE = {0,1} (2-cycle); IN = {2} (2->0); OUT = {3} (1->3);
# TUBE = {4} (2->4->3 bypassing core); TENDRIL = {5} (2->5, dead end)
# and {6} (6->3, no inbound); DISCONNECTED = {7,8} (isolated 2-cycle).
HAND = [(0, 1), (1, 0), (2, 0), (1, 3), (2, 4), (4, 3), (2, 5), (6, 3),
        (7, 8), (8, 7)]
HAND_REGIONS = {0: "CORE", 1: "CORE", 2: "IN", 3: "OUT", 4: "TUBE",
                5: "TENDRIL", 6: "TENDRIL", 7: "DISCONNECTED",
                8: "DISCONNECTED"}


def test_bowtie_hand_graph(spark):
    got = {r["id"]: r["region"]
           for r in bowtie_decomposition(edge_df(spark, HAND)).collect()}
    assert got == HAND_REGIONS
    assert got == nx_bowtie(HAND)


def test_bowtie_random_differential(spark):
    rng = random.Random(11)
    n, m = 60, 75  # sparse: all six regions realistically populated
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
    exp = nx_bowtie(pairs)
    got = {r["id"]: r["region"]
           for r in bowtie_decomposition(edge_df(spark, pairs)).collect()}
    assert got == exp


def test_reach_from_frontier(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "s long, d long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = {r["id"] for r in reach_from(edges, seeds).collect()}
    assert got == {0, 1, 2}
