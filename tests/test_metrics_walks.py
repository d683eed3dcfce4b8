"""Differential tests for the session-4 additions: link-prediction scores
(common neighbors / Adamic-Adar / preferential attachment), partition
modularity, degree assortativity, and deterministic random walks — each vs
a pure-Python replay on the reference fixture graphs plus seeded random
graphs."""

import math
import random
from collections import defaultdict

import numpy as np
from pyspark.sql import functions as F

from graph_python_spark.algorithms import (degree_assortativity,
                                           deterministic_walks,
                                           link_prediction_scores,
                                           modularity)
from tests.fixtures import CC12_COLS, CC12_ROWS, PR5_COLS, PR5_ROWS


def edge_df(spark, pairs):
    return spark.createDataFrame([(int(a), int(b)) for a, b in pairs], "i long, j long")


def rand_graph(n=40, m=160, seed=11):
    rng = random.Random(seed)
    return list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def _sym(pairs):
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _lp_oracle(pairs, min_common):
    adj = _sym(pairs)
    out = {}
    for u in adj:
        for v in adj:
            if u < v:
                common = adj[u] & adj[v]
                if len(common) >= min_common:
                    aa = sum(1.0 / math.log(len(adj[w])) for w in common)
                    out[(u, v)] = (len(common), aa, len(adj[u]) * len(adj[v]))
    return out


def test_link_predict_random(spark):
    pairs = rand_graph()
    want = _lp_oracle(pairs, min_common=2)
    got = {(r["u"], r["v"]): (r["common"], r["adamic_adar"], r["pref_attach"])
           for r in link_prediction_scores(edge_df(spark, pairs),
                                           min_common=2).collect()}
    assert set(got) == set(want)
    for k, (c, aa, pa) in want.items():
        gc, gaa, gpa = got[k]
        assert gc == c and gpa == pa
        assert np.isclose(gaa, aa, atol=1e-9)


def test_link_predict_max_degree_prunes_center_only(spark):
    # star center 0 with leaves 1..5 plus edge 1-2: capping out the hub
    # removes hub-mediated wedges but true degrees stay in pref_attach
    pairs = [(0, k) for k in range(1, 6)] + [(1, 2)]
    got = {(r["u"], r["v"]): r for r in
           link_prediction_scores(edge_df(spark, pairs), min_common=1,
                                  max_degree=3).collect()}
    # only wedges through centers of degree <= 3 survive: centers 1 and 2
    # (degree 2) give pair (0, 2) via 1 and (0, 1) via 2
    assert set(got) == {(0, 1), (0, 2)}
    assert got[(0, 1)]["pref_attach"] == 5 * 2  # true degrees, not capped


def _modularity_oracle(pairs, labels):
    adj = _sym(pairs)
    m2 = sum(len(s) for s in adj.values())
    deg_c = defaultdict(int)
    intra_c = defaultdict(int)
    for v, nbrs in adj.items():
        deg_c[labels[v]] += len(nbrs)
        for w in nbrs:
            if labels[v] == labels[w]:
                intra_c[labels[v]] += 1
    return sum(intra_c[c] / m2 - (deg_c[c] / m2) ** 2 for c in deg_c)


def test_modularity_two_cliques(spark):
    # two triangles joined by one edge; perfect partition scores high
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    labels = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    ldf = spark.createDataFrame(list(labels.items()), "id long, community long")
    row = modularity(edge_df(spark, pairs), ldf).collect()[0]
    want = _modularity_oracle(pairs, labels)
    assert row["n_communities"] == 2
    assert np.isclose(row["modularity"], round(want, 6), atol=1e-9)
    # one-community degenerate partition scores 0
    ldf0 = ldf.select("id", F.lit(0).alias("community"))
    row0 = modularity(edge_df(spark, pairs), ldf0).collect()[0]
    assert np.isclose(row0["modularity"], 0.0, atol=1e-9)


def test_modularity_random(spark):
    pairs = rand_graph(seed=13)
    labels = {v: v % 3 for p in pairs for v in p}
    ldf = spark.createDataFrame(list(labels.items()), "id long, community long")
    row = modularity(edge_df(spark, pairs), ldf).collect()[0]
    want = _modularity_oracle(pairs, labels)
    assert np.isclose(row["modularity"], round(want, 6), atol=1e-9)


def _assortativity_oracle(pairs):
    adj = _sym(pairs)
    xs, ys = [], []
    for v, nbrs in adj.items():
        for w in nbrs:
            xs.append(len(adj[v]))
            ys.append(len(adj[w]))
    return float(np.corrcoef(xs, ys)[0, 1])


def test_assortativity_star_is_negative(spark):
    pairs = [(0, k) for k in range(1, 8)]
    row = degree_assortativity(edge_df(spark, pairs)).collect()[0]
    assert row["n_edges"] == 7
    assert row["assortativity"] == -1.0  # pure star: perfectly disassortative


def test_assortativity_random(spark):
    pairs = rand_graph(seed=17)
    row = degree_assortativity(edge_df(spark, pairs)).collect()[0]
    want = _assortativity_oracle(pairs)
    assert np.isclose(row["assortativity"], round(want, 6), atol=1e-6)


def _walks_oracle(pairs, seeds, steps):
    adj = defaultdict(list)
    for a, b in set(pairs):
        adj[a].append(b)
    for v in adj:
        adj[v].sort()
    out = set()
    for s in seeds:
        v = s
        out.add((s, 0, s))
        for t in range(1, steps + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break
            r = ((s * 1000003 + t * 10007 + v * 31) % 1000000007) % len(nbrs)
            v = nbrs[r]
            out.add((s, t, v))
    return out


def test_walks_pr5(spark):
    pairs = list(zip(PR5_ROWS, PR5_COLS))
    seeds = sorted({v for p in pairs for v in p})[:3]
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {(r["walk"], r["step"], r["v"])
           for r in deterministic_walks(edge_df(spark, pairs), sdf, steps=6).collect()}
    assert got == _walks_oracle(pairs, seeds, 6)


def test_walks_random_and_sinks(spark):
    pairs = rand_graph(seed=19)
    # add a guaranteed sink reachable in one hop
    pairs += [(0, 999)]
    seeds = [0, 1, 2, 3, 4]
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {(r["walk"], r["step"], r["v"])
           for r in deterministic_walks(edge_df(spark, pairs), sdf, steps=8).collect()}
    want = _walks_oracle(pairs, seeds, 8)
    assert got == want
    # every walk is a contiguous step range starting at 0 (stops, no gaps)
    by_walk = defaultdict(set)
    for w, t, _ in got:
        by_walk[w].add(t)
    for w, ts in by_walk.items():
        assert ts == set(range(max(ts) + 1))


def test_walks_deterministic_across_partitionings(spark):
    pairs = list(zip(CC12_ROWS, CC12_COLS))
    sdf = spark.createDataFrame([(0,), (3,)], "id long")
    e1 = edge_df(spark, pairs).repartition(1)
    e2 = edge_df(spark, pairs).repartition(7)
    r1 = sorted(map(tuple, deterministic_walks(e1, sdf, steps=5).collect()))
    r2 = sorted(map(tuple, deterministic_walks(e2, sdf, steps=5).collect()))
    assert r1 == r2


def test_pseudo_diameter_path_and_star(spark):
    from graph_python_spark.algorithms.traversal import pseudo_diameter

    path = edge_df(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    row = pseudo_diameter(path, rounds=8).collect()[0]
    assert (row["start"], row["far_a"], row["far_b"], row["diameter_lb"]) == (0, 4, 0, 4)

    star = edge_df(spark, [(0, k) for k in range(1, 6)])
    row = pseudo_diameter(star, rounds=8).collect()[0]
    # from 0 the farthest is leaf 1 (tie-break min id); from 1 the farthest
    # is another leaf at distance 2
    assert (row["start"], row["far_a"], row["diameter_lb"]) == (0, 1, 2)
    assert row["far_b"] == 2


def _ngram_oracle(texts, n, num, den, df_cap):
    shingles = {}
    for did, t in texts.items():
        ln = max(1, len(t) - (n - 1))
        shingles[did] = {t[i:i + n] for i in range(ln)}
    from collections import Counter
    dfreq = Counter(tok for s in shingles.values() for tok in s)
    capped = {did: {tok for tok in s if dfreq[tok] <= df_cap}
              for did, s in shingles.items()}
    out = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(capped[a] & capped[b])
            union = len(capped[a]) + len(capped[b]) - inter
            if inter and inter * den >= union * num:
                out[(a, b)] = (inter, union)
    return out


def test_ngram_jaccard_differential(spark):
    from graph_python_spark.pipeline.dedup import ngram_jaccard_pairs

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumped over the lazy dog",
        3: "a completely different document body here",
        4: "the quick brown fox jumps over the lazy dog",  # exact dup of 1
        5: "tiny",                                          # shorter than n
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): (r["inter"], r["union_sz"])
           for r in ngram_jaccard_pairs(docs, n=8, threshold_num=1,
                                        threshold_den=2, df_cap=10).collect()}
    want = _ngram_oracle(texts, 8, 1, 2, 10)
    assert got == want
    assert (1, 4) in got and got[(1, 4)][0] == got[(1, 4)][1]  # exact dup
    assert (1, 2) in got  # one-word edit still a near-dup


def test_ngram_df_cap_drops_boilerplate(spark):
    from graph_python_spark.pipeline.dedup import ngram_jaccard_pairs

    # identical boilerplate in every doc; unique tails.  Each pair shares
    # the 12 boilerplate-only shingles of 26 distinct (Jaccard 12/26).
    # With the cap at 2 those shingles (df = 3) vanish, the tails share
    # nothing, and no candidate pair even materializes.
    texts = {1: "SHARED-BOILERPLATE aaaaaaa", 2: "SHARED-BOILERPLATE bbbbbbb",
             3: "SHARED-BOILERPLATE ccccccc"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    capped = ngram_jaccard_pairs(docs, n=8, threshold_num=2, threshold_den=5,
                                 df_cap=2).collect()
    assert capped == []
    uncapped = ngram_jaccard_pairs(docs, n=8, threshold_num=2,
                                   threshold_den=5).collect()
    assert len(uncapped) == 3  # 12/26 passes 2/5 for every pair
    assert all(r["inter"] == 12 and r["union_sz"] == 26 for r in uncapped)


def _harmonic_oracle(pairs, seeds, rounds):
    adj = defaultdict(set)
    for a, b in set(pairs):
        adj[a].add(b)
    dist = {}
    for s in seeds:
        d = {s: 0}
        for _ in range(rounds):
            new = dict(d)
            for v, dv in d.items():
                for w in adj.get(v, ()):
                    if dv + 1 < new.get(w, 1 << 60):
                        new[w] = dv + 1
            d = new
        for v, dv in d.items():
            if dv > 0:
                dist.setdefault(v, []).append(dv)
    return {v: sum(1.0 / d for d in ds) for v, ds in dist.items()}


def test_harmonic_random(spark):
    from graph_python_spark.algorithms.centrality import harmonic_centrality

    pairs = rand_graph(seed=23)
    seeds = sorted({v for p in pairs for v in p})[:4]
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {r["id"]: r["harmonic"]
           for r in harmonic_centrality(edge_df(spark, pairs), sdf,
                                        rounds=6).collect()}
    want = _harmonic_oracle(pairs, seeds, 6)
    assert set(got) == set(want)
    for v, h in want.items():
        assert np.isclose(got[v], h, atol=1e-9)


def test_harmonic_path(spark):
    from graph_python_spark.algorithms.centrality import harmonic_centrality

    # directed path 0->1->2->3: from seed 0, H = 1, 1/2, 1/3
    pairs = [(0, 1), (1, 2), (2, 3)]
    sdf = spark.createDataFrame([(0,)], "id long")
    got = {r["id"]: r["harmonic"]
           for r in harmonic_centrality(edge_df(spark, pairs), sdf,
                                        rounds=8).collect()}
    assert got == {1: 1.0, 2: 0.5, 3: 1.0 / 3.0}


def test_neighbor_mean_embeddings(spark):
    from graph_python_spark.pipeline.features import neighbor_mean_embeddings

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0]), (2, [5.0, 6.0])],
        "vec_id long, embedding array<double>")
    edges = spark.createDataFrame(
        [(0, 2), (1, 2), (0, 1)], "src long, dst long")
    got = {(r["id"], r["pos"]): (r["mean_val"], r["n_nbrs"])
           for r in neighbor_mean_embeddings(edges, emb).collect()}
    assert got == {
        (2, 0): (2.0, 2), (2, 1): (3.0, 2),   # mean of vec 0 and 1
        (1, 0): (1.0, 1), (1, 1): (2.0, 1),   # vec 0 alone
    }


def test_l2_normalize(spark):
    from graph_python_spark.pipeline.features import l2_normalize

    emb = spark.createDataFrame(
        [(0, [3.0, 4.0]), (1, [0.0, 0.0])],
        "vec_id long, embedding array<double>")
    rows = {r["vec_id"]: r["embedding"] for r in l2_normalize(emb).collect()}
    assert np.allclose(rows[0], [0.6, 0.8])
    assert rows[1] == [0.0, 0.0]  # zero vector passes through, no NaN


def _cocitation_oracle(pairs, min_total):
    e = set(pairs)
    inn = defaultdict(set)
    out = defaultdict(set)
    for a, b in e:
        out[a].add(b)
        inn[b].add(a)
    res = {}
    verts = {v for p in e for v in p}
    for u in verts:
        for v in verts:
            if u < v:
                cc = len(inn[u] & inn[v])
                cp = len(out[u] & out[v])
                if cc + cp >= min_total:
                    res[(u, v)] = (cc, cp)
    return res


def test_cocitation_random(spark):
    from graph_python_spark.algorithms.vertexsim import cocitation_scores

    pairs = rand_graph(seed=29)
    want = _cocitation_oracle(pairs, min_total=1)
    got = {(r["u"], r["v"]): (r["cocite"], r["coupling"])
           for r in cocitation_scores(edge_df(spark, pairs),
                                      min_total=1).collect()}
    assert got == want


def test_cocitation_directed_semantics(spark):
    from graph_python_spark.algorithms.vertexsim import cocitation_scores

    # 0->2, 1->2 (coupling for (0,1)); 3->0, 3->1 (cocite for (0,1))
    pairs = [(0, 2), (1, 2), (3, 0), (3, 1)]
    got = {(r["u"], r["v"]): (r["cocite"], r["coupling"])
           for r in cocitation_scores(edge_df(spark, pairs),
                                      min_total=1).collect()}
    assert got == {(0, 1): (1, 1)}
