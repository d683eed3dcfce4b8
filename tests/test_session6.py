"""Differential tests for the session-6 additions: KMV neighborhood
sketches (ANF), DAG longest-path layering, reciprocity, BM25 ranking,
contamination check, and SemDeDup — each vs a pure-Python replay on small
seeded graphs / corpora."""

import hashlib
import math
import random
from collections import defaultdict

from pyspark.sql import functions as F

from graph_python_spark.algorithms.anf import anf_sketches
from graph_python_spark.algorithms.metrics import reciprocity
from graph_python_spark.algorithms.traversal import dag_longest_path_levels
from graph_python_spark.pipeline.retrieval import bm25_topk, contamination_check


def edge_df(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "i long, j long")


def rand_graph(n=30, m=90, seed=7):
    rng = random.Random(seed)
    return list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def _md5(v):
    return hashlib.md5(str(v).encode()).hexdigest()


def _anf_oracle(pairs, radius, k):
    adj = defaultdict(set)
    verts = set()
    for a, b in pairs:
        adj[a].add(b)
        verts.update((a, b))
    sk = {v: {_md5(v)} for v in verts}
    for _ in range(radius):
        sk = {v: set(sorted(sk[v] | set().union(*(sk[u] for u in adj[v])) if adj[v]
                            else sk[v])[:k])
              for v in verts}
    out = {}
    for v, s in sk.items():
        ss = sorted(s)[:k]
        if len(ss) < k:
            est = float(len(ss))
        else:
            est = (k - 1) / (int(ss[k - 1][:12], 16) / 16 ** 12)
        out[v] = (len(ss), round(est, 6))
    return out


def test_anf_exact_below_k(spark):
    # tiny graph: every ball smaller than k -> n_exact IS the ball size
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (5, 0)]
    got = {r["id"]: (r["n_exact"], r["est_reach"])
           for r in anf_sketches(edge_df(spark, pairs), radius=4, k=16).collect()}
    # out-ball of 5 at radius 4: {5,0,1,2,3} reached -> 5 members incl self
    assert got[5][0] == 5 and got[5][1] == 5.0
    assert got[4] == (1, 1.0)
    oracle = _anf_oracle(pairs, 4, 16)
    assert got == oracle


def test_anf_estimator_matches_replay(spark):
    pairs = rand_graph(n=40, m=200, seed=13)
    got = {r["id"]: (r["n_exact"], r["est_reach"])
           for r in anf_sketches(edge_df(spark, pairs), radius=3, k=8).collect()}
    assert got == _anf_oracle(pairs, 3, 8)
    # saturated sketches must estimate within KMV error of the true ball
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
    for v in got:
        ball = {v}
        frontier = {v}
        for _ in range(3):
            frontier = set().union(*(adj[u] for u in frontier)) - set() if frontier else set()
            ball |= frontier
        if got[v][0] == 8:  # saturated
            assert got[v][1] > 3  # sanity: estimator positive and nontrivial
            assert abs(got[v][1] - len(ball)) / len(ball) < 1.5


def _dag_oracle(pairs, rounds):
    dag = {(a, b) for a, b in pairs if a < b}
    verts = {v for e in dag for v in e}
    lvl = {v: 0 for v in verts}
    for _ in range(rounds):
        new = dict(lvl)
        for v in verts:
            preds = [lvl[a] + 1 for a, b in dag if b == v]
            if preds:
                new[v] = max(lvl[v], max(preds))
        lvl = new
    return lvl


def test_dag_levels(spark):
    pairs = rand_graph(n=25, m=80, seed=3)
    dag_pairs = [(a, b) for a, b in pairs if a < b]
    got = {r["id"]: r["level"]
           for r in dag_longest_path_levels(edge_df(spark, dag_pairs), rounds=10).collect()}
    assert got == _dag_oracle(pairs, 10)
    # converged: one more round changes nothing (10 >= depth of a 25-vertex DAG path)
    got11 = {r["id"]: r["level"]
             for r in dag_longest_path_levels(edge_df(spark, dag_pairs), rounds=11).collect()}
    assert got == got11


def test_dag_levels_chain(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3)]
    got = {r["id"]: r["level"]
           for r in dag_longest_path_levels(edge_df(spark, pairs), rounds=5).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_reciprocity(spark):
    pairs = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (4, 4), (0, 2)]
    row = reciprocity(edge_df(spark, pairs)).collect()[0]
    # non-loop distinct edges: 6; reciprocal: (0,1),(1,0),(2,3),(3,2) = 4
    assert row["n_edges"] == 6
    assert row["n_reciprocal"] == 4
    assert row["reciprocity"] == round(4 / 6, 6)


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox naps all day long today"),
    (2, "sparks fly when the engine turns over quickly"),
    (3, "a completely different document about nothing at all"),
    (4, "the quick brown fox jumps over the lazy dog again and again"),
]


def _tok(t):
    return [w for w in t.split(" ") if w]


def test_bm25_matches_replay(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    terms = ("quick", "fox", "engine")
    got = [(r["doc_id"], r["n_hit_terms"], r["score"])
           for r in bm25_topk(docs, terms, k=3, k1=1.2, b=0.75).collect()]

    toks = {d: _tok(t) for d, t in DOCS}
    n = float(len(DOCS))
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for d, v in toks.items():
        s, hits = 0.0, 0
        for t in terms:
            tf = v.count(t)
            if tf:
                hits += 1
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(v) / avgdl))
        if hits:
            scores[d] = (hits, round(s, 6))
    want = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:3]
    assert got == [(d, h, s) for d, (h, s) in want]


def test_contamination(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 0)
    train = docs.filter(F.col("doc_id") > 0)
    got = {r["doc_id"]: (r["n_ngrams"], r["n_contaminated"], r["contamination"])
           for r in contamination_check(train, bench, n=3).collect()}
    bench_grams = {" ".join(_tok(DOCS[0][1])[i:i + 3])
                   for i in range(len(_tok(DOCS[0][1])) - 2)}
    for d, t in DOCS[1:]:
        tk = _tok(t)
        grams = {" ".join(tk[i:i + 3]) for i in range(len(tk) - 2)}
        hit = len(grams & bench_grams)
        assert got[d] == (len(grams), hit, round(hit / len(grams), 6))
    # doc 4 contains doc 0's opening verbatim -> contaminated
    assert got[4][1] > 0
    # doc 3 shares nothing
    assert got[3][1] == 0


def test_contamination_short_doc(spark):
    docs = spark.createDataFrame([(9, "too short")], "doc_id long, text string")
    bench = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    row = contamination_check(docs, bench, n=3).collect()[0]
    assert (row["n_ngrams"], row["n_contaminated"], row["contamination"]) == (0, 0, 0.0)


def test_semdedup_prunes_duplicate_vectors(spark):
    from graph_python_spark.pipeline.similarity import semantic_dedup

    rng = random.Random(5)
    rows = []
    for i in range(24):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(8)]))
    rows.append((24, [x * 1.001 for x in rows[0][1]]))   # near-dup of 0
    rows.append((25, list(rows[3][1])))                  # exact dup of 3
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: (r["pruned"], r["dup_of"])
           for r in semantic_dedup(emb, k=2, iterations=2, threshold=0.999).collect()}
    assert len(got) == 26
    assert got[24] == (True, 0)
    assert got[25] == (True, 3)
    assert not got[0][0] and not got[3][0]


def test_neighborhood_function(spark):
    from graph_python_spark.algorithms.anf import neighborhood_function

    # directed path 0->1->2->3->4 plus isolated pair 10->11
    e = edge_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11)])
    got = {r["r"]: (r["total_micro"], r["frac"])
           for r in neighborhood_function(e, radius=3, k=16).collect()}
    # balls are all < k so the estimates are exact counts:
    # r=0: 7 verts * 1; r=1: path 2+2+2+2+1, pair 2+1 = 12
    # r=2: 3+3+3+2+1 + 2+1 = 15; r=3: 4+4+3+2+1 + 3 = 17
    assert got[0][0] == 7_000_000
    assert got[1][0] == 12_000_000
    assert got[2][0] == 15_000_000
    assert got[3] == (17_000_000, 1.0)
    assert got[1][1] == round(12 / 17, 6)
