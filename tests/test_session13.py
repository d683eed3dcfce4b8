"""Round-3 session-13 operators: SCC condensation DAG and HyperBall
harmonic centrality — seeded-random differentials vs networkx."""

import hashlib
import random

import networkx as nx
import numpy as np
import pytest

from graph_python_spark.algorithms.anf import hyperball_harmonic
from graph_python_spark.algorithms.scc import condensation
from graph_python_spark.pipeline.packing import shard_assign
from graph_python_spark.pipeline.similarity import ivf_pq_topk, pq_adc_topk


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


def _emb_df(spark, n=48, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    rows = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_pq_single_cell_equals_full_adc(spark):
    """With one cell and one probe the IVF restriction is vacuous — the
    result must equal the full compressed scan."""
    emb = _emb_df(spark)
    qids = [0, 1, 2]
    a = sorted(map(tuple, ivf_pq_topk(
        emb, qids, dim=8, k=4, m=2, codebook_k=4, iterations=1,
        n_cells=1, n_probe=1).collect()))
    b = sorted(map(tuple, pq_adc_topk(
        emb, qids, dim=8, k=4, m=2, codebook_k=4,
        iterations=1).collect()))
    assert a == b


def test_ivf_pq_respects_probed_cells(spark):
    """Every returned neighbor must live in one of its query's probed
    cells, and per-query ranks must be contiguous from 1."""
    emb = _emb_df(spark, n=60)
    qids = [0, 1, 2, 3]
    out = ivf_pq_topk(emb, qids, dim=8, k=5, m=2, codebook_k=4,
                      iterations=1, n_cells=6, n_probe=2).collect()
    # recompute routing/probing with the same public building blocks
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from graph_python_spark.pipeline.similarity import _dot
    cents = (emb.orderBy(F.md5(F.col("vec_id").cast("string")).asc(),
                         F.col("vec_id").asc()).limit(6)
             .select(F.col("vec_id").alias("cell"),
                     F.col("embedding").alias("_c")))
    routed = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cell", _dot(F.col("embedding"), F.col("_c")).alias("a"))
    w = Window.partitionBy("vec_id").orderBy(F.col("a").desc(),
                                             F.col("cell").asc())
    cell_of = {r["vec_id"]: r["cell"] for r in
               routed.withColumn("rn", F.row_number().over(w))
               .filter("rn = 1").collect()}
    probes = {(r["vec_id"], r["cell"]) for r in
              routed.filter(F.col("vec_id").isin(qids))
              .withColumn("rn", F.row_number().over(w))
              .filter("rn <= 2").collect()}
    by_q = {}
    for r in out:
        assert (r["query_id"], cell_of[r["neighbor_id"]]) in probes
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_shard_assign_matches_local_replay(spark):
    docs = spark.createDataFrame(
        [(i, "x") for i in range(1000)], "doc_id long, text string")
    got = {r["doc_id"]: (r["shard"], r["pos_in_shard"])
           for r in shard_assign(docs, docs_per_shard=64).collect()}
    order = sorted(range(1000),
                   key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    want = {doc: (rank // 64, rank % 64) for rank, doc in enumerate(order)}
    assert got == want


def test_densest_subgraph_matches_local_replay(spark):
    from fractions import Fraction

    from graph_python_spark.algorithms.densest import densest_subgraph

    pairs = random_digraph(21, n=50, m=200)
    summary, members = densest_subgraph(
        edge_df(spark, pairs), epsilon=Fraction(0, 1), max_rounds=12)
    got = [(r["round"], r["n_vertices"], r["n_edges"],
            r["density"], r["is_best"]) for r in
           sorted(summary.collect(), key=lambda r: r["round"])]
    got_members = {r["id"] for r in members.collect()}

    # local replay of the integer-threshold peel
    und = {frozenset((a, b)) for a, b in pairs if a != b}
    live = {tuple(sorted(e)) for e in und}
    rows, best = [], None
    snapshots = []
    for r in range(12):
        verts = {v for e in live for v in e}
        if not verts:
            break
        ne, nv = len(live), len(verts)
        rows.append((r, nv, ne, round(ne / nv, 6)))
        snapshots.append(verts)
        if best is None or Fraction(ne, nv) > best[1]:
            best = (r, Fraction(ne, nv))
        deg = {}
        for a, b in live:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v in verts if deg[v] * nv > 2 * ne}
        live = {e for e in live if e[0] in keep and e[1] in keep}
    want = [(r, v, e, d, 1 if r == best[0] else 0) for r, v, e, d in rows]
    assert got == want
    assert got_members == snapshots[best[0]]


def test_heavy_hitters_exact_under_tiny_capacity(spark):
    """Zipf-ish corpus, capacity far below the vocabulary, adversarial
    partitioning — the MG pruning pass must never lose a reportable
    token, so the output equals the exact local computation."""
    from graph_python_spark.pipeline.sketches import heavy_hitters

    rng = random.Random(5)
    words = []
    for w in range(200):
        words += [f"w{w:03d}"] * (1000 // (w + 1))
    rng.shuffle(words)
    docs = [(i, " ".join(words[i * 20:(i + 1) * 20]))
            for i in range((len(words) + 19) // 20)]
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(13)
    got = [(r["token"], r["n"], r["share"]) for r in
           heavy_hitters(df, k=10, capacity=16).collect()]

    from collections import Counter
    c = Counter(words)
    n = len(words)
    want = sorted(((t, m) for t, m in c.items() if m * 16 > n),
                  key=lambda x: (-x[1], x[0]))[:10]
    want = [(t, m, round(m / n, 6)) for t, m in want]
    assert got == want


def test_bpe_encode_matches_python_replay(spark):
    """Train-and-apply must equal a pure-Python BPE replay (same word
    histogram cap, same greedy merge order, same string-replace
    non-overlap semantics)."""
    from collections import Counter

    from graph_python_spark.pipeline.text import bpe_encode

    texts = ["the cat sat on the mat", "the bat and the cat",
             "a mat and a hat", "the the the cat cat", "hat bat mat sat"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_bpe"], r["ratio"])
           for r in bpe_encode(docs, merges=6).collect()}

    words = [w for t in texts for w in t.split() if w]
    wf = Counter(words)
    vocab = {("|" + "||".join(w) + "|"): c for w, c in wf.items()}
    merge_list = []
    for _ in range(6):
        pc = Counter()
        for w, c in vocab.items():
            syms = w.strip("|").split("||")
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), _c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merge_list.append((a, b))
        vocab = {w.replace(f"|{a}||{b}|", f"|{a}{b}|"): c
                 for w, c in vocab.items()}

    def enc_len(w):
        s = "|" + "||".join(w) + "|"
        for a, b in merge_list:
            s = s.replace(f"|{a}||{b}|", f"|{a}{b}|")
        return len(s.strip("|").split("||"))

    want = {}
    for d, t in enumerate(texts):
        ws = [w for w in t.split() if w]
        nb = sum(enc_len(w) for w in ws)
        want[d] = (len(ws), nb, round(nb / len(ws), 6))
    assert got == want


def test_partition_assign_matches_local_replay(spark):
    from graph_python_spark.algorithms.partition import (partition_assign,
                                                         partition_quality)

    pairs = random_digraph(31, n=60, m=200)
    k, rounds = 4, 3
    e = edge_df(spark, pairs)
    assign = partition_assign(e, k=k, rounds=rounds)
    got = {r["id"]: r["part"] for r in assign.collect()}

    und = {tuple(sorted((a, b))) for a, b in pairs if a != b}
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    verts = sorted(nbrs)
    nv = len(verts)
    cap = (21 * nv) // (20 * k) + 1
    part = {v: v % k for v in verts}
    for _ in range(rounds):
        load = {}
        for v in verts:
            load[part[v]] = load.get(part[v], 0) + 1
        desired = {}
        for v in verts:
            cand = {part[v]: 0}
            for u in nbrs[v]:
                cand[part[u]] = cand.get(part[u], 0) + 1
            best = min(cand,
                       key=lambda p: (-(cand[p] * nv - load.get(p, 0)), p))
            desired[v] = (best, cand[best] * nv - load.get(best, 0))
        new = dict(part)
        by_part = {}
        for v, (p, sc) in desired.items():
            by_part.setdefault(p, []).append((v, sc))
        for p, vs in by_part.items():
            vs.sort(key=lambda t: (-t[1], t[0]))
            for v, _sc in vs[:cap]:
                new[v] = p
        part = new
    assert got == part

    q = {r["part"]: (r["n_vertices"], r["internal_edges"], r["cut_edges"])
         for r in partition_quality(e, assign).collect()}
    assert sum(v for v, _i, _c in q.values()) == nv
    internal = sum(i for _v, i, _c in q.values())
    cut2 = sum(c for _v, _i, c in q.values())
    assert internal + cut2 // 2 == len(und) and cut2 % 2 == 0


def test_logreg_classifier_matches_numpy_replay_and_separates(spark):
    from graph_python_spark.pipeline.features import (logreg_classifier,
                                                      logreg_score)

    rng = random.Random(9)
    pos_vocab = [f"p{i}" for i in range(8)]
    neg_vocab = [f"n{i}" for i in range(8)]
    rows = []
    for d in range(80):
        label = d % 2
        vocab = pos_vocab if label else neg_vocab
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(12)), label))
    docs = spark.createDataFrame(rows, "doc_id long, text string, label long")
    dim, steps, lr = 16, 3, 1.0
    w = logreg_classifier(docs, dim=dim, steps=steps, lr=lr)

    # numpy replay with the identical quantization contract
    feats = {}
    for d, text, label in rows:
        toks = [t for t in text.split(" ") if t]
        cnt = {}
        for t in toks:
            j = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim
            cnt[j] = cnt.get(j, 0) + 1
        xs = {j: c / len(toks) for j, c in cnt.items()}
        xs[dim] = 1.0
        feats[d] = (xs, float(label))
    import math

    def rnd(v):
        # Spark/DuckDB ROUND is half-away-from-zero, not Python's half-even
        return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)

    wv = [0.0] * (dim + 1)
    n = len(rows)
    for _ in range(steps):
        grads = {}
        for d, (xs, yv) in feats.items():
            zq = sum(rnd(wv[j] * x * 1e9) for j, x in xs.items())
            p = round(1.0 / (1.0 + math.exp(-(zq / 1e9))), 9)
            for j, x in xs.items():
                grads[j] = grads.get(j, 0) + rnd((p - yv) * x * 1e6)
        wv = [wv[j] - lr * (grads.get(j, 0) / 1e6) / n
              for j in range(dim + 1)]
    assert all(abs(a - b) < 1e-12 for a, b in zip(w, wv))

    # and it must actually separate the two vocabularies
    scores = {r["doc_id"]: r["score"]
              for r in logreg_score(docs, w).collect()}
    pos = [scores[d] for d, _t, l in rows if l == 1]
    neg = [scores[d] for d, _t, l in rows if l == 0]
    assert min(pos) > max(neg)


def test_triangles_incremental_matches_full_difference(spark):
    from graph_python_spark.algorithms.triangles import (triangle_count,
                                                         triangles_incremental)

    pairs = list(random_digraph(41, n=40, m=260))
    old = [(a, b) for a, b in pairs if (a + b) % 4 != 0]
    e_all, e_old = edge_df(spark, pairs), edge_df(spark, old)
    row = triangles_incremental(e_old, e_all).first()
    t_all = triangle_count(e_all)
    t_old = triangle_count(e_old)
    assert row["n_new_triangles"] == t_all - t_old
    und_all = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    und_old = {tuple(sorted(p)) for p in old if p[0] != p[1]}
    assert row["n_added_edges"] == len(und_all - und_old)


def test_effective_diameter_exact_when_unsaturated(spark):
    from graph_python_spark.algorithms.anf import effective_diameter

    pairs = random_digraph(51, n=30, m=70)
    radius, qq = 4, 0.9
    row = effective_diameter(edge_df(spark, pairs), q=qq, radius=radius,
                             k=512).first()

    G = nx.DiGraph()
    G.add_edges_from((a, b) for a, b in pairs if a != b)
    totals = []
    for r in range(radius + 1):
        t = 0
        for v in G.nodes:
            t += len(nx.single_source_shortest_path_length(G, v, cutoff=r))
        totals.append(t * 1_000_000)  # micro-units, exact ints
    tm = totals[radius]
    for r, cur in enumerate(totals):
        if float(cur) >= qq * tm:
            if r == 0:
                eff = 0.0
            else:
                eff = (r - 1) + (qq * tm - float(totals[r - 1])) \
                    / float(cur - totals[r - 1])
            assert row["r"] == r
            assert row["eff_diameter"] == pytest.approx(round(eff, 6),
                                                        abs=1e-9)
            break


def test_weighted_matching_valid_and_half_approx(spark):
    """Valid matching (no shared vertices), matches the local
    dominant-edge replay, and achieves >= 1/2 of the max-weight matching
    at the fixpoint (checked vs networkx on a small graph)."""
    from graph_python_spark.algorithms.matching import weighted_matching

    rng = random.Random(61)
    pairs = {}
    for _ in range(120):
        a, b = rng.randrange(30), rng.randrange(30)
        if a != b:
            key = tuple(sorted((a, b)))
            w = round(rng.uniform(0.1, 10.0), 3)
            pairs[key] = max(pairs.get(key, 0.0), w)
    rows = [(a, b, w) for (a, b), w in pairs.items()]
    e = spark.createDataFrame(rows, "i long, j long, v double")
    got = [(r["a"], r["b"], r["w"]) for r in
           weighted_matching(e, rounds=8).collect()]

    used = set()
    for a, b, _w in got:
        assert a not in used and b not in used
        used.update((a, b))

    # local dominant-edge replay
    alive = dict(pairs)
    matched = []
    for _ in range(8):
        best = {}
        for (a, b), w in alive.items():
            for v in (a, b):
                k = (w, -a, -b)
                if v not in best or k > best[v][0]:
                    best[v] = (k, (a, b))
        wins = [(a, b) for (a, b) in alive
                if best[a][1] == (a, b) and best[b][1] == (a, b)]
        for a, b in wins:
            matched.append((a, b, alive[(a, b)]))
        dead = {v for ab in wins for v in ab}
        alive = {ab: w for ab, w in alive.items()
                 if ab[0] not in dead and ab[1] not in dead}
    assert sorted(got) == sorted(matched)

    G = nx.Graph()
    for (a, b), w in pairs.items():
        G.add_edge(a, b, weight=w)
    opt = sum(G[a][b]["weight"]
              for a, b in nx.max_weight_matching(G))
    assert sum(w for _a, _b, w in got) >= 0.5 * opt


def test_nmi_matches_python_replay_and_identities(spark):
    import math

    from graph_python_spark.algorithms.metrics import \
        normalized_mutual_information

    def rnd(v):
        return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)

    rng = random.Random(71)
    rows = [(i, rng.randrange(5), rng.randrange(3)) for i in range(400)]
    a = spark.createDataFrame([(i, x) for i, x, _ in rows],
                              "id long, label long")
    b = spark.createDataFrame([(i, y) for i, _, y in rows],
                              "id long, label long")
    got = normalized_mutual_information(a, b).first()

    from collections import Counter
    nab = Counter((x, y) for _, x, y in rows)
    na = Counter(x for _, x, _ in rows)
    nb = Counter(y for _, _, y in rows)
    n = len(rows)
    # cell-level quantization — each sum ranges over the joint cells
    ha = sum(rnd(-(c / n) * math.log(na[x] / n) * 1e9)
             for (x, y), c in nab.items()) / 1e9
    hb = sum(rnd(-(c / n) * math.log(nb[y] / n) * 1e9)
             for (x, y), c in nab.items()) / 1e9
    mi = sum(rnd((c / n) * math.log((n * c) / (na[x] * nb[y])) * 1e9)
             for (x, y), c in nab.items()) / 1e9
    assert got["h_a"] == round(ha, 6)
    assert got["h_b"] == round(hb, 6)
    assert got["mi"] == round(mi, 6)
    assert got["nmi"] == round(2.0 * mi / (ha + hb), 6)

    # identity: NMI(A, A) == 1 for a non-trivial labeling
    same = normalized_mutual_information(a, a).first()
    assert same["nmi"] == pytest.approx(1.0, abs=1e-6)


def test_spearman_matches_scipy_free_replay(spark):
    from graph_python_spark.algorithms.metrics import spearman_correlation

    rng = random.Random(81)
    rows = [(i, rng.uniform(0, 100), rng.uniform(0, 100) + 0.3 * i)
            for i in range(300)]
    a = spark.createDataFrame([(i, x) for i, x, _ in rows],
                              "id long, score double")
    b = spark.createDataFrame([(i, y) for i, _, y in rows],
                              "id long, score double")
    got = spearman_correlation(a, b).first()

    def ranks(key):
        order = sorted(rows, key=key)
        return {i: r for r, (i, _x, _y) in enumerate(order)}
    ra = ranks(lambda t: (-t[1], t[0]))
    rb = ranks(lambda t: (-t[2], t[0]))
    sd2 = sum((ra[i] - rb[i]) ** 2 for i, _x, _y in rows)
    n = len(rows)
    rho = 1.0 - (6.0 * sd2) / (n * (n * n - 1))
    assert got["n"] == n and got["sum_d2"] == sd2
    assert got["spearman"] == round(rho, 6)

    # identity: perfectly concordant scores -> rho = 1
    same = spearman_correlation(a, a).first()
    assert same["spearman"] == 1.0


def test_spectral_gap_matches_numpy_eigen(spark):
    from graph_python_spark.algorithms.spectral import spectral_gap

    pairs = list({tuple(sorted((a, b)))
                  for a, b in random_digraph(91, n=24, m=90) if a != b})
    e = edge_df(spark, pairs)
    row = spectral_gap(e, iterations=40).first()

    ids = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    d = A.sum(axis=1)
    P = A / np.sqrt(np.outer(d, d))
    ev = np.sort(np.linalg.eigvalsh(P))
    lam2 = max(abs(ev[0]), abs(ev[-2]))  # largest |λ| excluding λ1 = 1
    assert row["lambda2_abs"] == pytest.approx(lam2, abs=1e-3)


def test_spectral_gap_zero_on_disconnected(spark):
    from graph_python_spark.algorithms.spectral import spectral_gap

    cl1 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    cl2 = [(a + 10, b + 10) for a in range(5) for b in range(a + 1, 5)]
    e = edge_df(spark, cl1 + cl2)
    row = spectral_gap(e, iterations=30).first()
    assert row["lambda2_abs"] == pytest.approx(1.0, abs=1e-6)
    assert row["spectral_gap"] == pytest.approx(0.0, abs=1e-6)


def test_s_core_matches_local_replay(spark):
    from graph_python_spark.algorithms.kcore import s_core

    rng = random.Random(97)
    und = {}
    for _ in range(180):
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            k = tuple(sorted((a, b)))
            und[k] = max(und.get(k, 0), round(rng.uniform(0.5, 3.0), 3))
    rows = [(a, b, w) for (a, b), w in und.items()]
    e = spark.createDataFrame(rows, "i long, j long, v double")
    sval = 6.0
    got = {r["id"]: r["wdeg"] for r in s_core(e, s=sval).collect()}

    wm = {k: round(w * 1e6) for k, w in und.items()}
    sm = round(sval * 1e6)
    live = dict(wm)
    while True:
        wd = {}
        for (a, b), w in live.items():
            wd[a] = wd.get(a, 0) + w
            wd[b] = wd.get(b, 0) + w
        keep = {v for v, w in wd.items() if w >= sm}
        new = {k: w for k, w in live.items()
               if k[0] in keep and k[1] in keep}
        if len(new) == len(live):
            break
        live = new
    wd = {}
    for (a, b), w in live.items():
        wd[a] = wd.get(a, 0) + w
        wd[b] = wd.get(b, 0) + w
    want = {v: round(w / 1e6, 6) for v, w in wd.items() if w >= sm}
    assert got == want
