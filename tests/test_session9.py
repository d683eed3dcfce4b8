"""Session-9 additions: bipartite one-mode projection (B·B^T plus_pair)
and the Bloom-bucket-prefiltered decontamination plan — each vs a
pure-Python replay plus plan-equivalence checks."""

import random
from collections import Counter

from pyspark.sql import functions as F

from graph_python_spark.algorithms.vertexsim import bipartite_project
from graph_python_spark.algorithms.walks import node2vec_walks
from graph_python_spark.pipeline.retrieval import (
    contamination_check,
    contamination_check_pruned,
)

_P1, _P2, _P3, _MOD = 1000003, 10007, 31, 1000000007


# ---------------------------------------------------------------------------
# bipartite_project
# ---------------------------------------------------------------------------
def bip_df(spark, pairs):
    return spark.createDataFrame(
        [(int(l), int(r)) for l, r in pairs], "l long, r long")


def test_bipartite_project_basic(spark):
    # baskets: r=1 holds {1,2,3}; r=2 holds {2,3}; r=3 holds {3}
    inc = bip_df(spark, [(1, 1), (2, 1), (3, 1), (2, 2), (3, 2), (3, 3),
                         (2, 2)])  # duplicate incidence row must not double-count
    out = {(r.u, r.v): r.weight for r in bipartite_project(inc).collect()}
    assert out == {(1, 2): 1, (1, 3): 1, (2, 3): 2}


def test_bipartite_project_min_weight_and_hub_cap(spark):
    rng = random.Random(11)
    pairs = list({(rng.randrange(30), rng.randrange(12)) for _ in range(150)})
    # one huge right hub shared by everyone
    hub = [(l, 99) for l in range(30)]
    inc = bip_df(spark, pairs + hub)

    def replay(rows, max_rdeg=None, min_w=1):
        by_r = {}
        for l, r in set(rows):
            by_r.setdefault(r, set()).add(l)
        cnt = Counter()
        for r, ls in by_r.items():
            if max_rdeg is not None and len(ls) > max_rdeg:
                continue
            ls = sorted(ls)
            for i in range(len(ls)):
                for j in range(i + 1, len(ls)):
                    cnt[(ls[i], ls[j])] += 1
        return {p: w for p, w in cnt.items() if w >= min_w}

    got = {(r.u, r.v): r.weight
           for r in bipartite_project(inc, min_weight=2).collect()}
    assert got == replay(pairs + hub, min_w=2)

    # capping right-degree at 20 drops the hub's wedges but nothing else
    got_cap = {(r.u, r.v): r.weight
               for r in bipartite_project(inc, max_right_degree=20).collect()}
    assert got_cap == replay(pairs + hub, max_rdeg=20)


def test_bipartite_project_column_names(spark):
    inc = spark.createDataFrame([(5, 100), (6, 100)], "part long, ord long")
    out = bipartite_project(inc, left="part", right="ord").collect()
    assert [(r.u, r.v, r.weight) for r in out] == [(5, 6, 1)]


# ---------------------------------------------------------------------------
# node2vec_walks
# ---------------------------------------------------------------------------
def replay_node2vec(edge_pairs, seeds, steps, wr=2, ws=4, wq=1):
    adj = {}
    for a, b in sorted(set(edge_pairs)):
        adj.setdefault(a, []).append(b)   # sorted neighbor lists
    nset = {s: set(ns) for s, ns in adj.items()}
    out = []
    for s in seeds:
        out.append((s, 0, s))
        v, prev = s, None
        if v not in adj:
            continue
        nb = adj[v]
        r = ((s * _P1 + 1 * _P2 + v * _P3) % _MOD) % len(nb)
        prev, v = v, nb[r]
        out.append((s, 1, v))
        for t in range(2, steps + 1):
            if v not in adj:
                break
            best = None
            for x in adj[v]:
                w = wr if x == prev else (ws if x in nset[prev] else wq)
                cand = (w * ((s * _P1 + t * _P2 + v * _P3 + x * _P1) % _MOD), x)
                if best is None or cand > best:
                    best = cand
            prev, v = v, best[1]
            out.append((s, t, v))
    return sorted(out)


def test_node2vec_differential(spark):
    rng = random.Random(29)
    pairs = list({(rng.randrange(25), rng.randrange(25)) for _ in range(120)
                  })
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = spark.createDataFrame(pairs, "i long, j long")
    seed_ids = sorted({a for a, _ in pairs})[:6]
    seeds = spark.createDataFrame([(s,) for s in seed_ids], "id long")
    got = sorted((r.walk, r.step, r.v)
                 for r in node2vec_walks(edges, seeds, steps=5).collect())
    assert got == replay_node2vec(pairs, seed_ids, steps=5)


def test_node2vec_sink_stops_and_return_bias(spark):
    # line graph 0->1->2 with 2 a sink; walk from 0 stops at step 2
    edges = spark.createDataFrame([(0, 1), (1, 2)], "i long, j long")
    seeds = spark.createDataFrame([(0,)], "id long")
    got = sorted((r.walk, r.step, r.v)
                 for r in node2vec_walks(edges, seeds, steps=6).collect())
    assert got == [(0, 0, 0), (0, 1, 1), (0, 2, 2)]

    # 0 <-> 1 only: every step after the first must return to prev
    # regardless of weights (it is the only candidate)
    edges2 = spark.createDataFrame([(0, 1), (1, 0)], "i long, j long")
    got2 = sorted((r.walk, r.step, r.v)
                  for r in node2vec_walks(edges2, seeds, steps=4).collect())
    assert got2 == [(0, 0, 0), (0, 1, 1), (0, 2, 0), (0, 3, 1), (0, 4, 0)]


# ---------------------------------------------------------------------------
# butterfly_counts
# ---------------------------------------------------------------------------
def test_butterfly_counts(spark):
    from graph_python_spark.algorithms.vertexsim import butterfly_counts

    # K2,2 on left {1,2} right {10,11} = exactly one butterfly for each of
    # 1 and 2; left 3 shares only one right vertex with 1 -> no butterfly
    inc = bip_df(spark, [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)])
    got = {r.id: r.butterflies for r in butterfly_counts(inc).collect()}
    assert got == {1: 1, 2: 1}


def test_butterfly_counts_random_differential(spark):
    rng = random.Random(5)
    pairs = list({(rng.randrange(20), rng.randrange(10)) for _ in range(90)})
    inc = bip_df(spark, pairs)

    by_r = {}
    for l, r in set(pairs):
        by_r.setdefault(r, set()).add(l)
    w = Counter()
    for ls in by_r.values():
        ls = sorted(ls)
        for i in range(len(ls)):
            for j in range(i + 1, len(ls)):
                w[(ls[i], ls[j])] += 1
    expect = Counter()
    for (u, v), cnt in w.items():
        if cnt >= 2:
            b = cnt * (cnt - 1) // 2
            expect[u] += b
            expect[v] += b
    from graph_python_spark.algorithms.vertexsim import butterfly_counts
    got = {r.id: r.butterflies for r in butterfly_counts(inc).collect()}
    assert got == dict(expect)


# ---------------------------------------------------------------------------
# knn_graph
# ---------------------------------------------------------------------------
def _rand_emb_rows(n=30, dim=8, seed=23):
    rng = random.Random(seed)
    return [(i, [round(rng.uniform(-1, 1), 4) for _ in range(dim)])
            for i in range(n)]


def _knn_replay(rows, k, mutual):
    import numpy as np

    vecs = {i: np.array([np.float64(np.float32(x)) for x in v])
            for i, v in rows}
    nrm = {i: float(np.sqrt(np.dot(v, v))) for i, v in vecs.items()}
    knn = {}
    for i in vecs:
        sims = sorted(
            ((-round(float(np.dot(vecs[i], vecs[j])) / (nrm[i] * nrm[j]), 6), j)
             for j in vecs if j != i))
        knn[i] = {(j, -s, r + 1) for r, (s, j) in enumerate(sims[:k])}
    out = set()
    for i, es in knn.items():
        fwd = {j for j, _, _ in es}
        for j, s, r in es:
            if not mutual or i in {x for x, _, _ in knn[j]}:
                out.add((i, j, s, r))
    return out


def test_knn_graph_exact_differential(spark):
    from graph_python_spark.pipeline.similarity import knn_graph

    rows = _rand_emb_rows()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for mutual in (False, True):
        got = {(r.src, r.dst, r.cos_sim, r.rank)
               for r in knn_graph(emb, k=4, mutual=mutual,
                                  method="exact").collect()}
        assert got == _knn_replay(rows, 4, mutual), f"mutual={mutual}"


def test_knn_graph_lsh_recall(spark):
    from graph_python_spark.pipeline.similarity import knn_graph

    rows = _rand_emb_rows(n=60, dim=8, seed=31)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r.src, r.dst)
             for r in knn_graph(emb, k=3, method="exact").collect()}
    lsh = {(r.src, r.dst)
           for r in knn_graph(emb, k=3, method="lsh", dim=8,
                              bands=12, band_bits=2).collect()}
    # LSH edges are a subset of candidates ranked the same way; recall of
    # the true kNN edge set must be high at this banding
    assert lsh, "lsh produced no edges"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.6, recall


# ---------------------------------------------------------------------------
# directed_triangle_census
# ---------------------------------------------------------------------------
def test_triad_census_hand_fixtures(spark):
    from graph_python_spark.algorithms.triangles import directed_triangle_census

    # pure 3-cycle: 1 cyclic, 0 transitive
    cyc = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "i long, j long")
    r = directed_triangle_census(cyc).first()
    assert (r.cyclic, r.transitive) == (1, 0)
    # transitive triple: 0 cyclic, 1 transitive
    tr = spark.createDataFrame([(0, 1), (1, 2), (0, 2)], "i long, j long")
    r = directed_triangle_census(tr).first()
    assert (r.cyclic, r.transitive) == (0, 1)
    # full K3 with reciprocal edges everywhere: both cycle orientations
    # (2 cyclic) and every ordered transitive triple (6)
    k3 = spark.createDataFrame(
        [(a, b) for a in range(3) for b in range(3) if a != b],
        "i long, j long")
    r = directed_triangle_census(k3).first()
    assert (r.cyclic, r.transitive) == (2, 6)


def test_triad_census_random_differential(spark):
    from graph_python_spark.algorithms.triangles import directed_triangle_census

    rng = random.Random(41)
    pairs = [(a, b) for a, b in
             {(rng.randrange(15), rng.randrange(15)) for _ in range(80)}
             if a != b]
    es = set(pairs)
    cyclic = sum(1 for i, j in es for k in range(15)
                 if (j, k) in es and (k, i) in es and i < j and i < k)
    transitive = sum(1 for i, j in es for k in range(15)
                     if (j, k) in es and (i, k) in es)
    edges = spark.createDataFrame(pairs, "i long, j long")
    r = directed_triangle_census(edges).first()
    assert (r.cyclic, r.transitive) == (cyclic, transitive)


# ---------------------------------------------------------------------------
# centroid_classify
# ---------------------------------------------------------------------------
def test_centroid_classify_differential(spark):
    import numpy as np

    from graph_python_spark.pipeline.similarity import (
        KMEANS_SCALE,
        centroid_classify,
    )

    rng = random.Random(17)
    dim, n = 6, 40
    rows = []
    for i in range(n):
        lab = i % 3
        vec = [round(rng.uniform(-1, 1) + 2.0 * lab, 4) for _ in range(dim)]
        rows.append((i, vec, lab))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: (r.label, r.predicted, r.correct)
           for r in centroid_classify(emb).collect()}

    # replay: quantized-mean centroids, argmin L2, ties to smaller label
    arr = np.array([[np.float64(np.float32(x)) for x in v] for _, v, _ in rows])
    labs = np.array([l for _, _, l in rows])
    cents = {}
    for lab in sorted(set(labs)):
        m = arr[labs == lab]
        cents[lab] = np.round(m * KMEANS_SCALE).sum(axis=0) / (len(m) * KMEANS_SCALE)
    for i in range(n):
        best = min((float(np.dot(arr[i] - cents[l], arr[i] - cents[l])), l)
                   for l in cents)
        assert got[i] == (labs[i], best[1], int(labs[i] == best[1])), i
    # well-separated classes must classify perfectly
    assert all(c == 1 for _, _, c in got.values())


# ---------------------------------------------------------------------------
# contamination_check_pruned ≡ contamination_check
# ---------------------------------------------------------------------------
def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_contamination_pruned_matches_exact(spark):
    rng = random.Random(3)
    vocab = [f"w{k}" for k in range(40)]
    bench_texts = [" ".join(rng.choice(vocab) for _ in range(12)) for _ in range(4)]
    train_texts = (
        [" ".join(rng.choice(vocab) for _ in range(25)) for _ in range(12)]
        + [bench_texts[0]]          # fully contaminated doc
        + ["short doc", ""]          # < n tokens -> zero n-grams
    )
    bench = docs_df(spark, bench_texts)
    train = docs_df(spark, train_texts)
    exact = {r.doc_id: (r.n_ngrams, r.n_contaminated, r.contamination)
             for r in contamination_check(train, bench, n=3).collect()}
    pruned = {r.doc_id: (r.n_ngrams, r.n_contaminated, r.contamination)
              for r in contamination_check_pruned(train, bench, n=3).collect()}
    assert pruned == exact
    # the fully-contaminated copy really registers as 1.0
    assert exact[len(train_texts) - 3][2] == 1.0


def test_contamination_pruned_tiny_buckets_still_exact(spark):
    # buckets=2 forces massive bucket collisions: the prefilter passes
    # nearly everything and the exact semi-join must still remove every
    # false positive — output identical to the exact path
    texts = ["a b c d e f", "x y z a b c", "p q r s t u"]
    bench = docs_df(spark, ["a b c d"])
    train = docs_df(spark, texts)
    exact = sorted(map(tuple, contamination_check(train, bench, n=3).collect()))
    pruned = sorted(map(tuple, contamination_check_pruned(
        train, bench, n=3, buckets=2).collect()))
    assert pruned == exact
