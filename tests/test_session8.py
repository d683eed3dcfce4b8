"""Session-8 additions: graph contraction (quotient graph), global
transitivity, rich-club coefficient, and the composite quality filter —
each vs a pure-Python replay plus hand-built edge-case fixtures."""

import random
from collections import Counter, defaultdict

from pyspark.sql import functions as F

from graph_python_spark.algorithms import contract_graph, rich_club, transitivity
from graph_python_spark.pipeline.text import quality_filter


def edge_df(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(v)) for a, b, v in triples], "i long, j long, v long")


def rand_graph(n=40, m=160, seed=7):
    rng = random.Random(seed)
    return list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


# ---------------------------------------------------------------------------
# contract_graph
# ---------------------------------------------------------------------------
def test_contract_drop_unmapped(spark):
    edges = edge_df(spark, [(1, 2, 5), (2, 1, 1), (3, 4, 2), (1, 4, 7), (9, 1, 3)])
    mapping = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 11), (4, 11)], "id long, group long")
    out = {(r.gi, r.gj): r.w for r in contract_graph(edges, mapping).collect()}
    # 1→2 and 2→1 collapse into self-loop (dropped); 3→4 self-loop dropped;
    # 1→4 crosses groups; 9→1 touches an unmapped vertex (dropped)
    assert out == {(10, 11): 7}


def test_contract_keep_unmapped_and_self_loops(spark):
    edges = edge_df(spark, [(1, 2, 5), (9, 1, 3), (9, 9, 4)])
    mapping = spark.createDataFrame([(1, 10), (2, 10)], "id long, group long")
    out = {(r.gi, r.gj): r.w
           for r in contract_graph(edges, mapping, drop_self_loops=False,
                                   unmapped="keep").collect()}
    # unmapped vertex 9 becomes singleton group -(9+1) = -10
    assert out == {(10, 10): 5, (-10, 10): 3, (-10, -10): 4}


def test_contract_random_differential(spark):
    pairs = rand_graph(n=60, m=400, seed=13)
    edges = edge_df(spark, [(a, b, a + b + 1) for a, b in pairs])
    groups = {v: v % 7 for v in range(60)}
    mapping = spark.createDataFrame(list(groups.items()), "id long, group long")
    expect = Counter()
    for a, b in pairs:
        ga, gb = groups[a], groups[b]
        if ga != gb:
            expect[(ga, gb)] += a + b + 1
    got = {(r.gi, r.gj): r.w for r in contract_graph(edges, mapping).collect()}
    assert got == dict(expect)


# ---------------------------------------------------------------------------
# transitivity / rich_club
# ---------------------------------------------------------------------------
def _sym(pairs):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _transitivity_oracle(pairs):
    adj = _sym(pairs)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    tri = 0
    for a in adj:
        for b in adj[a]:
            if b > a:
                for c in adj[b]:
                    if c > b and c in adj[a]:
                        tri += 1
    return wedges, tri


def test_transitivity_triangle_plus_pendant(spark):
    # triangle 1-2-3 plus pendant 3-4: wedges = 1+1+3+0 = 5, triangles = 1
    e = edge_df(spark, [(1, 2, 1), (2, 3, 1), (3, 1, 1), (3, 4, 1)])
    row = transitivity(e.select("i", "j")).collect()[0]
    assert (row.wedges, row.triangles) == (5, 1)
    assert abs(row.transitivity - 3.0 / 5.0) < 1e-9


def test_transitivity_random_differential(spark):
    pairs = rand_graph(n=30, m=180, seed=5)
    wedges, tri = _transitivity_oracle(pairs)
    row = transitivity(edge_df(spark, [(a, b, 1) for a, b in pairs])
                       .select("i", "j")).collect()[0]
    assert (row.wedges, row.triangles) == (wedges, tri)


def test_rich_club_star_plus_clique(spark):
    # K4 on {1,2,3,4} (deg 3 each) + star center 1 to leaves 10..15
    pairs = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    pairs += [(1, leaf) for leaf in range(10, 16)]
    e = edge_df(spark, [(a, b, 1) for a, b in pairs]).select("i", "j")
    rows = {r.k: r for r in rich_club(e, thresholds=(1, 2, 5)).collect()}
    # deg: v1 = 9, v2..v4 = 3, leaves = 1
    # k=1: nodes {1,2,3,4} (deg>1), edges among them = 6 (K4) → φ = 1.0
    assert rows[1].n_nodes == 4 and rows[1].n_edges == 6
    assert abs(rows[1].rich_club - 1.0) < 1e-9
    # k=2: same club
    assert rows[2].n_nodes == 4 and rows[2].n_edges == 6
    # k=5: only the hub qualifies → degenerate club, φ = 0
    assert rows[5].n_nodes == 1 and rows[5].n_edges == 0
    assert rows[5].rich_club == 0.0


def test_rich_club_random_differential(spark):
    pairs = rand_graph(n=30, m=200, seed=3)
    adj = _sym(pairs)
    canon = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    rows = {r.k: r for r in rich_club(
        edge_df(spark, [(a, b, 1) for a, b in pairs]).select("i", "j"),
        thresholds=(2, 6, 10)).collect()}
    for k in (2, 6, 10):
        nodes = {v for v, nb in adj.items() if len(nb) > k}
        ek = sum(1 for a, b in canon if a in nodes and b in nodes)
        assert rows[k].n_nodes == len(nodes)
        assert rows[k].n_edges == ek


# ---------------------------------------------------------------------------
# quality_filter
# ---------------------------------------------------------------------------
def _doc_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_quality_filter_rules(spark):
    good = "the quick brown fox jumps over a lazy dog while birds sing in trees"
    too_short = "hello world"
    repetitive = " ".join(["spam"] * 40)          # top-token + distinct fail
    long_words = " ".join(["x" * 30] * 20)        # mean word length fail
    rows = {r.doc_id: r for r in quality_filter(
        _doc_df(spark, [good, too_short, repetitive, long_words])).collect()}
    assert rows[0].keep
    assert not rows[1].ok_n_words and not rows[1].keep
    assert not rows[2].ok_distinct and not rows[2].ok_repetition
    assert rows[2].ok_n_words and not rows[2].keep
    assert not rows[3].ok_word_len and not rows[3].keep


def test_quality_filter_empty_doc(spark):
    rows = quality_filter(_doc_df(spark, ["", "   "])).collect()
    for r in rows:
        assert r.n_words == 0 and not r.keep
        assert not r.ok_word_len and not r.ok_distinct and not r.ok_repetition
